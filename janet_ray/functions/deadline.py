"""Per-row wall-clock guard (SURVEY.md §4 "timeouts / hung work").

Ray retries *failed* tasks but never kills a slow UDF row, so a single
pathological document (catastrophic-backtracking markup, a degenerate layout)
can wedge an actor forever. The reference bounds this with process/RPC
timeouts — the 30 s pdftoppm kill (apps/legacy/src/services/pdf.ts:61-70) and
the 60 s Vision cap (apps/ocr/src/lib/ocr-utils.ts:115-117). Inside a Ray
actor the equivalent is a SIGALRM deadline around each row: the handler
raises, the except-arm converts the row into an ``error`` row (error-as-data,
never a task failure), and the batch moves on.

Scope/limits (documented, deliberate):
  * signals only fire on the process MAIN thread — exactly where Ray executes
    (non-async) actor and task UDFs. Armed elsewhere, the guard degrades to a
    no-op rather than raising.
  * pure-Python loops are interrupted at the next bytecode; a single long
    C-level call (giant numpy op) is only interrupted on return. Our
    extraction hot paths are tokenizer/regex Python loops, which interrupt
    fine.
"""

from __future__ import annotations

import signal
import threading


class RowDeadlineExceeded(Exception):
    """A row exceeded its wall-clock budget."""


class row_deadline:
    """Context manager: ``with row_deadline(5.0): process(row)``.

    seconds=None or <=0 disarms. Re-entrant use is not supported (one timer per
    process) — arm it once per row at the outermost stage loop."""

    def __init__(self, seconds: float | None):
        self.seconds = seconds
        self._armed = False
        self._old_handler = None

    def _fire(self, signum, frame):
        raise RowDeadlineExceeded(f"row exceeded {self.seconds:g}s deadline")

    def __enter__(self):
        if (self.seconds and self.seconds > 0
                and threading.current_thread() is threading.main_thread()):
            self._old_handler = signal.signal(signal.SIGALRM, self._fire)
            signal.setitimer(signal.ITIMER_REAL, self.seconds)
            self._armed = True
        return self

    def __exit__(self, exc_type, exc, tb):
        if self._armed:
            signal.setitimer(signal.ITIMER_REAL, 0.0)
            # signal.signal() returns None when the prior handler was installed
            # outside Python (C extension) — restoring None raises TypeError
            signal.signal(signal.SIGALRM,
                          self._old_handler if self._old_handler is not None
                          else signal.SIG_DFL)
            self._armed = False
        return False
