from janet_ray.stages.html_extract import (
    Block,
    extract_html,
    select_main,
    tokenize_blocks,
)

LONG = (
    "This paragraph is comfortably longer than the sixty character minimum used by "
    "the content selector."
)


def test_basic_article_with_heading():
    html = f"<html><body><article><h1>My Title</h1><p>{LONG}</p></article></body></html>".encode()
    text, spans = extract_html(html)
    assert text == f"My Title\n\n{LONG}"
    assert spans[0]["kind"] == "h1" and spans[0]["start"] == 0 and spans[0]["end"] == 8
    assert spans[1]["start"] == 10 and spans[1]["end"] == 10 + len(LONG)


def test_heading_without_following_content_dropped():
    html = f"<h1>Lonely heading</h1><nav><a href=x>{'link ' * 30}</a></nav>".encode()
    text, _ = extract_html(html)
    assert text == ""


def test_link_dense_block_dropped():
    links = " ".join(f'<a href="/{i}">some link text here</a>' for i in range(10))
    html = f"<div>{links}</div><p>{LONG}</p>".encode()
    text, _ = extract_html(html)
    assert text == LONG


def test_entities_decoded_and_whitespace_collapsed():
    body = "A &amp; B &lt;tag&gt;   spaced\n\nout " + LONG
    html = f"<p>{body}</p>".encode()
    text, _ = extract_html(html)
    assert text.startswith("A & B <tag> spaced out ")


def test_script_style_comment_cdata_skipped():
    html = (
        "<script>var a = '<p>fake</p>'; if (1<2) {}</script>"
        "<style>p{color:red}</style>"
        "<!-- <p>comment</p> -->"
        f"<p>{LONG}</p>"
    ).encode()
    text, _ = extract_html(html)
    assert text == LONG


def test_short_blocks_dropped():
    html = f"<p>too short</p><p>{LONG}</p><footer>tiny</footer>".encode()
    text, _ = extract_html(html)
    assert text == LONG


def test_multiple_paragraphs_joined_with_blank_line():
    html = f"<p>{LONG}</p><p>{LONG}</p>".encode()
    text, spans = extract_html(html)
    assert text == f"{LONG}\n\n{LONG}"
    assert [s["page"] for s in spans] == [0, 1]


def test_anchor_text_counts_as_link_chars():
    blocks = tokenize_blocks('<p>plain <a href="x">linked text</a> tail</p>')
    assert len(blocks) == 1
    b = blocks[0]
    assert b.text == "plain linked text tail"
    assert 0 < b.link_chars <= len("linked text") + 1


def test_select_main_density_threshold():
    content = Block("p", "x" * 100, 0)
    linky = Block("p", "x" * 100, 50)
    assert select_main([content]) == [0]
    assert select_main([linky]) == []


def test_unterminated_tag_drops_tail():
    text, _ = extract_html(f"<p>{LONG}</p><div class='unterminated".encode())
    assert text == LONG


def test_table_wrapped_content_survives():
    html = f"<table><tr><td><div><p>{LONG}</p></div></td></tr></table>".encode()
    text, _ = extract_html(html)
    assert text == LONG


def test_true_megapage_bounded_and_correct():
    """A 5 MB single-document page extracts correctly in one pass (O(n)
    tokenizer, no pathological blowup) — the megapage skew class at real size."""
    import time

    para = "meaningful content words repeated here for density scoring " * 10
    paras = [f"<p>{para}{i}</p>" for i in range(9000)]
    html = ("<html><head><title>t</title></head><body><nav>"
            + " ".join(f'<a href="/x{i}">link</a>' for i in range(50))
            + f"<article>{''.join(paras)}</article></body></html>").encode()
    assert len(html) > 5_000_000
    t0 = time.time()
    text, spans = extract_html(html)
    dt = time.time() - t0
    assert len(spans) == 9000
    assert text.startswith("meaningful content")
    assert dt < 10, f"megapage extraction took {dt:.1f}s"
