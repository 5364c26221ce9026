"""Deterministic synthetic Common-Crawl-style corpus generator (FIXTURES.md).

Seed-stable (numpy RandomState): the same (n, seed) always yields byte-identical
pages AND goldens. Golden text is computed from the *ground-truth content* the
generator embedded (title/paragraph/page structure) using the engine's pinned join
semantics — NOT by running the extractor — so golden comparison is a real oracle.

Row classes per FIXTURES.md §2 (cumulative shares):
    clean HTML 45% | boilerplate-heavy 15% | megapage 3% | text-layer PDF 20%
    | scanned PDF 12% | giant scanned 2% | malformed 3%
plus fixed-url golden anchors (§2) and ~2% duplicated urls (later warc_ts, same
content — the dedupe/last-wins oracle, apps/legacy/src/utils/file.ts:40-49).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from janet_ray.formats import jpdf
from janet_ray.schemas import PAGES_SCHEMA

SEED = 42
EPOCH = datetime(2024, 1, 1)

HOSTS = [
    "cdn.bigportal.example",  # hot host — ~30% of rows (skew exercise)
    "news.example", "blog.example", "docs.example", "shop.example",
    "travelers.example", "cobra.example", "yakima.example", "mozilla.example",
    "chase.example", "sutter.example", "irs.example", "pge.example",
    "wiki.example", "forum.example", "mail.example", "photos.example",
    "support.example", "dev.example", "status.example", "archive.example",
    "data.example", "api.example", "cloud.example", "edu.example",
]

# Per-language word stock (lang-id is testable: stopwords differ per language).
LANG_WORDS = {
    "en": ("the and of to in for with on by report data value system account payment "
           "service customer notice policy annual summary information quarterly "
           "billing insurance claim balance review important update records").split(),
    "es": ("el la de que los las para con una datos cuenta pago servicio cliente "
           "aviso anual resumen informe sistema valor importante registro").split(),
    "de": ("der die das und mit von daten konto zahlung dienst kunde hinweis "
           "bericht system wert wichtig unterlagen jahres zusammenfassung").split(),
    "fr": ("le la et les des pour avec une données compte paiement service client "
           "avis annuel résumé rapport système valeur important dossier").split(),
    "zh": list("数据账户支付服务客户通知年度摘要信息系统报告价值重要记录季度保险"),
}
LANGS = ["en", "es", "de", "fr", "zh"]
LANG_P = [0.5, 0.15, 0.12, 0.13, 0.10]

ORG_SPRINKLE = ["Travelers", "Mozilla", "Chase", "PG&E", "Stanford Health Care",
                "Internal Revenue Service", "WageWorks", "TD Ameritrade"]
MONTHS = ["January", "February", "March", "April", "May", "June", "July",
          "August", "September", "October", "November", "December"]


def _sentence(rng: np.random.RandomState, words: list[str], n: int, joiner: str = " ") -> str:
    picks = [words[rng.randint(len(words))] for _ in range(n)]
    s = joiner.join(picks)
    return s[0].upper() + s[1:] if s and s[0].isalpha() else s


def _paragraph(rng, words, n_words=18, joiner=" ") -> str:
    """Paragraph guaranteed to clear the extractor's MIN_CONTENT_CHARS threshold
    (golden paragraphs must be unambiguous content blocks)."""
    s = _sentence(rng, words, n_words, joiner)
    while len(s) < 70:
        s = s + joiner + words[rng.randint(len(words))]
    return s + "."


def _date_str(rng) -> str:
    m = MONTHS[rng.randint(12)]
    return f"{m} {rng.randint(27) + 1}, {2020 + rng.randint(6)}"


def _article(rng, lang: str, n_paras: int) -> tuple[str, list[str]]:
    """→ (title, paragraphs). First paragraph carries a date + org + amount sprinkle
    so filename/metadata derivation has real signal."""
    words = LANG_WORDS[lang]
    joiner = "" if lang == "zh" else " "
    title = _sentence(rng, LANG_WORDS["en"], 4)
    paras = []
    lead = (
        f"Published {_date_str(rng)} by {ORG_SPRINKLE[rng.randint(len(ORG_SPRINKLE))]}"
        f" Statement No. {rng.randint(10**6, 10**7)} amount ${rng.randint(10, 5000)}.00 "
        + _paragraph(rng, words, 14, joiner)
    )
    paras.append(lead)
    # zh "words" are single chars — scale word count so every paragraph clears the
    # MIN_CONTENT_CHARS threshold of the extractor
    scale = 8 if lang == "zh" else 1
    for _ in range(n_paras - 1):
        paras.append(_paragraph(rng, words, (12 + rng.randint(12)) * scale, joiner))
    return title, paras


def _html_page(rng, title: str, paras: list[str], boiler_heavy: bool) -> bytes:
    def links(k):
        return " ".join(
            f'<a href="/l{rng.randint(999)}">{_sentence(rng, LANG_WORDS["en"], 3)}</a>'
            for _ in range(k)
        )

    nav = f"<nav>{links(8)}</nav>"
    ads = f'<div class="ads">{links(12)}</div>'
    style = "<style>body{margin:0;color:#222}.x{display:none}</style>"
    script = '<script>var q="<p>fake</p>"; if (1<2) { console.log(q); }</script>'
    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    article = f"<article><h1>{title}</h1>{body_paras}</article>"
    if boiler_heavy:
        pad_links = "".join(f"<li>{links(3)}</li>" for _ in range(30))
        blob = f"<script>{'x' * 2000}</script>"
        article = f"<table><tr><td><div>{article}</div></td></tr></table>"
        extra = f"<aside><ul>{pad_links}</ul></aside>{blob}"
    else:
        extra = ""
    footer = f"<footer>{links(4)} © 2024 corp</footer>"
    doc = (
        f"<!DOCTYPE html><html><head><title>{title}</title>{style}{script}</head>"
        f"<body>{nav}<header>{links(3)}</header>{ads}{extra}{article}{footer}</body></html>"
    )
    return doc.encode("utf-8")


def _html_golden(title: str, paras: list[str]) -> str:
    return "\n\n".join([title] + paras)


def _pdf_pages_items(rng, paras: list[str]) -> list[dict]:
    """Split paragraphs into per-page positioned text items (2 paragraphs/page,
    each paragraph split into 3-word items at increasing (y, x))."""
    pages = []
    for pi in range(0, len(paras), 2):
        items = []
        y = 40
        for para in paras[pi : pi + 2]:
            ws = para.split(" ")
            x = 30
            for j in range(0, len(ws), 3):
                items.append((x, y, " ".join(ws[j : j + 3])))
                x += 120
                if x > 500:
                    x, y = 30, y + 14
            y += 28
        pages.append({"items": items})
    return pages


def _pdf_golden(pages: list[dict]) -> str:
    page_texts = []
    for p in pages:
        items = sorted(p["items"], key=lambda it: (it[1], it[0]))
        page_texts.append(" ".join(it[2] for it in items))
    return "\n".join(page_texts).strip()


def _scan_golden(page_texts: list[str]) -> str:
    return "\n\n".join("\n".join(jpdf.wrap_text(t)) for t in page_texts).strip()


# ------------------------------------------------------------------ anchors

TRAVELERS_URL = "https://travelers.example/notice-0001"
COBRA_URL = "https://cobra.example/benefits-0001"
YAKIMA_URL = "https://yakima.example/rack-0001"
DOC22_URL = "https://news.example/doc22-0001"

_TRAVELERS_PAGES = [
    "Notice of Cancellation TRAVELERS Policy Number 612266004 "
    "FEBRUARY 25, 2024 this notice is to inform you that the policy "
    "referenced above will be cancelled for the reason stated below. Page 1",
    "Continued coverage details and payment instructions appear on this page "
    "of the TRAVELERS notice. Questions call your agent. Page 2",
]
TRAVELERS_FILENAME = "2024-02-25 Travelers - Notice of Cancellation 612266004.pdf"

_COBRA_TITLE = "Cobra benefits continuation overview"
_COBRA_PARAS = [
    "Published January 15, 2024 by WageWorks Statement No. 5551234 amount $125.00 "
    "your cobra continuation coverage election notice explains the cobra rights.",
    "Under cobra you may continue coverage for a limited period after a qualifying "
    "event and the cobra premium is payable monthly to the administrator.",
    "Contact the plan administrator with questions about cobra eligibility and "
    "enrollment deadlines for continuation coverage under the plan terms.",
]  # 'cobra' appears 6 times case-insensitively (1 title + 5 body)

_DOC22_TITLE = "Document retention guide"
_DOC22_PARAS = [
    "Published March 3, 2024 by Mozilla Statement No. 7770001 amount $75.00 "
    "this document explains how every document in the archive is retained: "
    "document intake, document storage, document indexing and document disposal.",
    "A document lifecycle starts when the document is captured; the document is "
    "then scanned, and the document metadata recorded for each document entry.",
    "Retention rules vary: a financial document is kept seven years, a legal "
    "document ten, and a medical document follows the document policy for health "
    "records. Review each document yearly against the document schedule.",
    "Finally archive the document, noting the document identifier in the document "
    "register kept under document control procedures.",
]


def _count_kw(text: str, kw: str) -> int:
    import re as _re

    return len(_re.findall(_re.escape(kw), text, _re.IGNORECASE))


# ------------------------------------------------------------------ generator


def gen_pages(n: int, seed: int = SEED) -> tuple[pa.Table, pa.Table, dict]:
    """→ (pages table, golden table, matches ground truth).

    golden columns: url, filename, text, route, success, error, n_pages.
    matches: {url: {keyword: count}} for the anchor docs."""
    rng = np.random.RandomState(seed)
    class_draw = rng.random(n)
    host_draw = rng.random(n)

    urls, tss, payloads, hints, langs = [], [], [], [], []
    g_url, g_file, g_text, g_route, g_succ, g_err, g_np = [], [], [], [], [], [], []

    def host_for(i):
        if host_draw[i] < 0.30:
            return HOSTS[0]
        return HOSTS[1 + int(host_draw[i] * 1000) % (len(HOSTS) - 1)]

    def emit(url, ts, payload, hint, lang, golden):
        urls.append(url)
        tss.append(ts)
        payloads.append(payload)
        hints.append(hint)
        langs.append(lang)
        if golden is not None:
            g_url.append(url)
            g_file.append(golden["filename"])
            g_text.append(golden["text"])
            g_route.append(golden["route"])
            g_succ.append(golden["success"])
            g_err.append(golden["error"])
            g_np.append(golden["n_pages"])

    matches: dict[str, dict[str, int]] = {}

    for i in range(n):
        ts = EPOCH + timedelta(seconds=int(i))
        # fixed anchors occupy the first four slots
        if i == 0:
            pages = [{"scan": t} for t in _TRAVELERS_PAGES]
            payload = jpdf.encode(pages)
            text = _scan_golden(_TRAVELERS_PAGES)
            emit(TRAVELERS_URL, ts, payload, "", "en",
                 dict(filename=TRAVELERS_FILENAME, text=text, route="ocr",
                      success=True, error="", n_pages=2))
            matches[TRAVELERS_URL] = {"612266004": _count_kw(text, "612266004"),
                                      "TRAVELERS": _count_kw(text, "TRAVELERS")}
            continue
        if i == 1:
            payload = _html_page(rng, _COBRA_TITLE, _COBRA_PARAS, False)
            text = _html_golden(_COBRA_TITLE, _COBRA_PARAS)
            emit(COBRA_URL, ts, payload, "", "en",
                 dict(filename="2024-01-15 WageWorks - Statement 5551234.pdf",
                      text=text, route="html", success=True, error="", n_pages=1))
            matches[COBRA_URL] = {"cobra": _count_kw(text, "cobra")}
            continue
        if i == 2:
            paras = ["Yakima rack installation statement for roof mounted carriers "
                     "prepared May 5, 2024 with Invoice No. 8881111 for the order.",
                     "The yakima system includes crossbars towers and locks and the "
                     "installation guide covers torque settings and maintenance."]
            pages = _pdf_pages_items(rng, paras)
            payload = jpdf.encode(pages)
            text = _pdf_golden(pages)
            emit(YAKIMA_URL, ts, payload, "", "en",
                 dict(filename="2024-05-05 Yakima - Statement 8881111.pdf",
                      text=text, route="pdf", success=True, error="",
                      n_pages=len(pages)))
            matches[YAKIMA_URL] = {"yakima": _count_kw(text, "yakima")}
            continue
        if i == 3:
            payload = _html_page(rng, _DOC22_TITLE, _DOC22_PARAS, False)
            text = _html_golden(_DOC22_TITLE, _DOC22_PARAS)
            assert _count_kw(text, "document") == 22, _count_kw(text, "document")
            emit(DOC22_URL, ts, payload, "", "en",
                 dict(filename="2024-03-03 Mozilla - Statement 7770001.pdf",
                      text=text, route="html", success=True, error="", n_pages=1))
            matches[DOC22_URL] = {"document": 22}
            continue

        host = host_for(i)
        lang = LANGS[int(np.searchsorted(np.cumsum(LANG_P), rng.random(), side="right"))]
        d = class_draw[i]
        if d < 0.45 or (0.45 <= d < 0.60):  # clean / boilerplate-heavy HTML
            boiler = d >= 0.45
            title, paras = _article(rng, lang, 6 + rng.randint(5))
            url = f"https://{host}/art-{i:07d}"
            emit(url, ts, _html_page(rng, title, paras, boiler), "", lang,
                 dict(filename="", text=_html_golden(title, paras), route="html",
                      success=True, error="", n_pages=1))
        elif d < 0.63:  # megapage HTML
            title, paras = _article(rng, lang, 400)
            url = f"https://{host}/mega-{i:07d}"
            emit(url, ts, _html_page(rng, title, paras, False), "", lang,
                 dict(filename="", text=_html_golden(title, paras), route="html",
                      success=True, error="", n_pages=1))
        elif d < 0.83:  # text-layer PDF (ASCII only → lang en)
            _, paras = _article(rng, "en", 4 + rng.randint(4))
            pages = _pdf_pages_items(rng, paras)
            url = f"https://{host}/doc-{i:07d}.pdf"
            emit(url, ts, jpdf.encode(pages), "", "en",
                 dict(filename="", text=_pdf_golden(pages), route="pdf",
                      success=True, error="", n_pages=len(pages)))
        elif d < 0.95:  # scanned PDF
            _, paras = _article(rng, "en", 4)
            page_texts = [" ".join(paras[j : j + 2]) for j in range(0, len(paras), 2)]
            url = f"https://{host}/scan-{i:07d}.pdf"
            emit(url, ts, jpdf.encode([{"scan": t} for t in page_texts]), "", "en",
                 dict(filename="", text=_scan_golden(page_texts), route="ocr",
                      success=True, error="", n_pages=len(page_texts)))
        elif d < 0.97:  # giant scanned PDF (50 pages)
            page_texts = []
            for _ in range(50):
                _, ps = _article(rng, "en", 4)
                page_texts.append(" ".join(ps))
            url = f"https://{host}/giant-{i:07d}.pdf"
            emit(url, ts, jpdf.encode([{"scan": t} for t in page_texts]), "", "en",
                 dict(filename="", text=_scan_golden(page_texts), route="ocr",
                      success=True, error="", n_pages=50))
        else:  # malformed
            kind = rng.randint(3)
            url = f"https://{host}/bad-{i:07d}"
            if kind == 0:
                payload = b"%PDF-1.7\n%JRAY\ntrunca"  # truncated container
            elif kind == 1:
                payload = b"\x00\x01\x02binary-junk" + bytes(rng.randint(0, 256, 16).astype(np.uint8))
            else:
                payload = b""
            emit(url, ts, payload, "", lang,
                 dict(filename="", text="", route="error", success=False,
                      error="*", n_pages=0))

    # ~2% duplicate urls: same content, warc_ts +1h → dedupe keeps the later row,
    # content identical so golden text is unchanged. Duplicates are inserted
    # ADJACENT to their originals so both captures land in the same input shard /
    # partition — the partitioning assumption the checkpoint runner's
    # partition-scoped dedupe relies on (CC-style crawls co-locate url recrawls by
    # url/host-prefixed layout; see pipelines/checkpoint.py docstring).
    n_dup = max(1, n // 50)
    dup_idx = set(
        int(x) for x in rng.choice(np.arange(len(urls)), size=min(n_dup, len(urls)), replace=False)
    )
    cols = [urls, tss, payloads, hints, langs]
    new_cols = [[], [], [], [], []]
    for j in range(len(urls)):
        for c, nc in zip(cols, new_cols):
            nc.append(c[j])
        if j in dup_idx:
            new_cols[0].append(urls[j])
            new_cols[1].append(tss[j] + timedelta(hours=1))
            new_cols[2].append(payloads[j])
            new_cols[3].append(hints[j])
            new_cols[4].append(langs[j])
    urls, tss, payloads, hints, langs = new_cols

    pages_tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(hints, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    golden_tbl = pa.table(
        {
            "url": pa.array(g_url, pa.string()),
            "filename": pa.array(g_file, pa.string()),
            "text": pa.array(g_text, pa.string()),
            "route": pa.array(g_route, pa.string()),
            "success": pa.array(g_succ, pa.bool_()),
            "error": pa.array(g_err, pa.string()),
            "n_pages": pa.array(g_np, pa.int32()),
        }
    )
    return pages_tbl, golden_tbl, matches


def ensure_pages_dir(n: int, seed: int = SEED, root: str = "/tmp/janet_ray_pages",
                     shard_rows: int = 1000) -> str:
    """Write (once, cached) the synthetic corpus as sharded parquet + golden +
    matches.json under root/n{n}-s{seed}/. Returns the directory.

    Sharded files (not one giant file) so ray.data.read_parquet gets natural input
    blocks, and so the checkpoint runner can partition by file (SURVEY.md §7.2.8)."""
    out = os.path.join(root, f"n{n}-s{seed}-r{shard_rows}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    pages, golden, matches = gen_pages(n, seed)
    for start in range(0, pages.num_rows, shard_rows):
        shard = pages.slice(start, shard_rows)
        pq.write_table(shard, os.path.join(tmp, "pages", f"part-{start // shard_rows:05d}.parquet"))
    pq.write_table(golden, os.path.join(tmp, "golden.parquet"))
    with open(os.path.join(tmp, "matches.json"), "w") as f:
        json.dump(matches, f, indent=1, sort_keys=True)
    open(os.path.join(tmp, "_DONE"), "w").close()
    if os.path.exists(out):  # lost race with a concurrent generator
        import shutil

        shutil.rmtree(tmp)
    else:
        os.replace(tmp, out)
    return out
