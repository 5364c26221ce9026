"""Per-row wall-clock guard (SURVEY.md §4 "timeouts / hung work").

Ray retries *failed* tasks but never kills a slow UDF row, so a single
pathological document (catastrophic-backtracking markup, a degenerate layout)
can wedge an actor forever. The reference bounds this with process/RPC
timeouts — the 30 s pdftoppm kill (apps/legacy/src/services/pdf.ts:61-70) and
the 60 s Vision cap (apps/ocr/src/lib/ocr-utils.ts:115-117). Inside a Ray
worker the equivalent is a per-row deadline: on expiry ``RowDeadlineExceeded``
is raised in the row's thread, the except-arm converts the row into an
``error`` row (error-as-data, never a task failure), and the batch moves on.

Two delivery mechanisms, chosen by thread:

* **main thread** — SIGALRM ``setitimer``. Also interrupts blocking syscalls
  (``sleep``, socket reads) via EINTR, the strongest guarantee available.
* **any other thread** — Ray 2.49 executes actor-pool ``map_batches`` UDFs on
  a non-main worker thread, where signals never fire. A per-process daemon
  watchdog thread tracks armed deadlines and, on expiry, delivers
  ``RowDeadlineExceeded`` to the armed thread via
  ``PyThreadState_SetAsyncExc`` — the exception is raised at that thread's
  next bytecode boundary, the same granularity SIGALRM has inside the eval
  loop.

Scope/limits (documented, deliberate):
  * pure-Python loops are interrupted at the next bytecode; a single long
    C-level call (giant numpy op, catastrophic ``re`` match) is only
    interrupted on return — true for BOTH mechanisms (CPython runs signal
    handlers at bytecode boundaries too). Our extraction hot paths are
    tokenizer loops in Python, which interrupt fine.
  * the watchdog path cancels a fired-but-undelivered exception on ``__exit__``
    (the row finished right at the wire), so no exception leaks into later
    rows; if delivery already happened inside ``__exit__`` the row is reported
    as deadline-exceeded, which at that point it was.
  * re-entrant use is not supported (one deadline per thread) — arm once per
    row at the outermost stage loop.
"""

from __future__ import annotations

import ctypes
import itertools
import signal
import threading
import time


class RowDeadlineExceeded(Exception):
    """A row exceeded its wall-clock budget.

    Raised asynchronously (no-arg instantiation) by the watchdog path, so the
    default message must be self-describing — ExtractStage records ``str(e)``
    as the row's error column."""

    def __init__(self, msg: str = "row exceeded wall-clock deadline"):
        super().__init__(msg)


# --------------------------------------------------------------- watchdog core
# One daemon thread per process; state guarded by _wd_cond's lock. The armed
# map is tiny (≤ #UDF threads), so the O(n) scan per wakeup is free.

_wd_cond = threading.Condition()
_wd_armed: dict[int, tuple[float, int]] = {}  # thread ident -> (deadline, gen)
_wd_fired: set[int] = set()  # generations the watchdog has fired
_wd_gen = itertools.count(1)
_wd_thread: threading.Thread | None = None
# the deadline the watchdog is currently sleeping toward (None = indefinitely).
# Arming only notifies when the new deadline is EARLIER — otherwise the
# watchdog's own timeout covers it, so the per-row cost is a lock + dict store
# with no cross-thread wakeup (measured: the unconditional notify woke the
# watchdog once per row).
_wd_next_wake: float | None = None


def _async_raise(ident: int) -> None:
    """Deliver RowDeadlineExceeded to the thread with the given ident."""
    n = ctypes.pythonapi.PyThreadState_SetAsyncExc(
        ctypes.c_ulong(ident), ctypes.py_object(RowDeadlineExceeded))
    if n > 1:  # over-matched (per CPython docs): undo to avoid collateral
        ctypes.pythonapi.PyThreadState_SetAsyncExc(
            ctypes.c_ulong(ident), ctypes.c_void_p(0))


def _async_cancel(ident: int) -> None:
    """Clear a pending (not yet delivered) async exception on the thread."""
    ctypes.pythonapi.PyThreadState_SetAsyncExc(
        ctypes.c_ulong(ident), ctypes.c_void_p(0))


def _watchdog_loop() -> None:
    global _wd_next_wake
    with _wd_cond:
        while True:
            now = time.monotonic()
            next_dl: float | None = None
            for ident, (dl, gen) in list(_wd_armed.items()):
                if dl <= now:
                    del _wd_armed[ident]
                    _wd_fired.add(gen)
                    _async_raise(ident)
                elif next_dl is None or dl < next_dl:
                    next_dl = dl
            _wd_next_wake = next_dl
            _wd_cond.wait(
                None if next_dl is None else max(0.0, next_dl - time.monotonic()))


def _ensure_watchdog() -> None:
    global _wd_thread
    if _wd_thread is None or not _wd_thread.is_alive():
        _wd_thread = threading.Thread(
            target=_watchdog_loop, name="janet-row-deadline-watchdog", daemon=True)
        _wd_thread.start()


# SIGALRM fast-arm state: ``signal.signal`` (handler install) costs ~8% of
# single-thread ExtractStage wall when paid per row (profiled: enum conversion
# + handler bookkeeping per call), while ``setitimer`` is a cheap syscall. So
# the handler installs ONCE per process and stays installed; per-row arming is
# just the setitimer pair. Single-owner contract: the engine's worker/driver
# processes own SIGALRM while extraction runs (nothing else in this engine
# uses it); the message for the shared handler lives in a module global —
# safe because signals only ever deliver on the main thread, which also does
# the arming on this path.
_sigalrm_installed = False
_sigalrm_msg = "row exceeded wall-clock deadline"


def _sigalrm_fire(signum, frame):
    raise RowDeadlineExceeded(_sigalrm_msg)


class row_deadline:
    """Context manager: ``with row_deadline(5.0): process(row)``.

    seconds=None or <=0 disarms. ``armed`` reports whether a live mechanism is
    guarding the body (always True when seconds>0 on CPython)."""

    def __init__(self, seconds: float | None):
        self.seconds = seconds
        self.armed = False
        self._mech: str | None = None
        self._ident: int | None = None
        self._gen: int | None = None

    def __enter__(self):
        if not (self.seconds and self.seconds > 0):
            return self
        if threading.current_thread() is threading.main_thread():
            global _sigalrm_installed, _sigalrm_msg
            _sigalrm_msg = f"row exceeded {self.seconds:g}s deadline"
            if not _sigalrm_installed:
                signal.signal(signal.SIGALRM, _sigalrm_fire)
                _sigalrm_installed = True
            signal.setitimer(signal.ITIMER_REAL, self.seconds)
            self._mech = "sigalrm"
        else:
            self._ident = threading.get_ident()
            self._gen = next(_wd_gen)
            dl = time.monotonic() + self.seconds
            with _wd_cond:
                _ensure_watchdog()
                _wd_armed[self._ident] = (dl, self._gen)
                if _wd_next_wake is None or dl < _wd_next_wake:
                    _wd_cond.notify()
            self._mech = "watchdog"
        self.armed = True
        return self

    def __exit__(self, exc_type, exc, tb):
        if not self.armed:
            return False
        if self._mech == "sigalrm":
            signal.setitimer(signal.ITIMER_REAL, 0.0)
            # handler intentionally stays installed (fast-arm contract above)
        else:
            with _wd_cond:
                entry = _wd_armed.pop(self._ident, None)
                if entry is None and self._gen in _wd_fired:
                    _wd_fired.discard(self._gen)
                    if exc_type is None or not issubclass(
                            exc_type, RowDeadlineExceeded):
                        # fired but not yet delivered — the row finished (or
                        # raised its OWN exception) at the wire; cancel the
                        # pending async exc so it can't land at an arbitrary
                        # later bytecode in this thread (a later row, or code
                        # outside any deadline)
                        _async_cancel(self._ident)
        self.armed = False
        return False
