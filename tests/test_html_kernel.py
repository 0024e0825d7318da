"""HTML extraction kernel — frozen-spec behaviors (FIXTURES.md §3a)."""

from pbx_ds_ocr_server_spark.config import ExtractConfig
from pbx_ds_ocr_server_spark.kernels import extract_html


def run(html: str | bytes, **cfg) -> str:
    payload = html.encode("utf-8") if isinstance(html, str) else html
    return extract_html(payload, ExtractConfig(**cfg)).text


def test_main_paragraphs_kept():
    assert run("<html><body><main><p>hello world</p></main></body></html>") == "hello world"


def test_blocks_joined_with_double_newline():
    assert run("<body><p>one</p><p>two</p></body>") == "one\n\ntwo"


def test_nav_aside_footer_header_dropped():
    html = (
        "<body><nav>skip me</nav><header>also</header>"
        "<p>content</p><aside>side</aside><footer>foot</footer></body>"
    )
    assert run(html) == "content"


def test_link_dense_block_dropped():
    html = (
        "<body><div><a href='/'>link one</a> <a href='/'>link two</a> tiny</div>"
        "<p>real content here with plenty of plain words</p></body>"
    )
    assert run(html) == "real content here with plenty of plain words"


def test_low_link_density_block_kept():
    html = "<body><p>plenty of plain words around one <a href='/'>link</a> in text</p></body>"
    assert run(html) == "plenty of plain words around one link in text"


def test_script_style_content_dropped():
    html = (
        "<body><script>var x = '<p>fake</p>';</script>"
        "<style>p{color:red}</style><p>real</p></body>"
    )
    assert run(html) == "real"


def test_title_not_in_content():
    assert run("<html><head><title>page title</title></head><body><p>body</p></body></html>") == "body"


def test_comments_stripped():
    assert run("<body><!-- <p>ghost</p> --><p>real</p></body>") == "real"


def test_entities_unescaped():
    assert run("<body><p>a &amp; b &lt;tag&gt; &#8212; dash</p></body>") == "a & b <tag> — dash"


def test_whitespace_collapsed():
    assert run("<body><p>a   b\n\t c</p></body>") == "a b c"


def test_inline_tags_do_not_split_blocks():
    assert run("<body><p>one <b>two</b> <em>three</em> four</p></body>") == "one two three four"


def test_block_tags_split():
    assert run("<body><div>one<div>two</div></div></body>") == "one\n\ntwo"


def test_br_splits_block():
    assert run("<body><p>one<br>two</p></body>") == "one\n\ntwo"


def test_stray_lt_is_text():
    assert run("<body><p>a < b and c > d</p></body>") == "a < b and c > d"


def test_unclosed_tags():
    assert run(b"<html><body><p>hello <b>world") == "hello world"


def test_empty_body():
    assert run("<html><body></body></html>") == ""


def test_zero_byte_payload():
    assert run(b"") == ""


def test_giant_inline_script_no_blowup():
    html = "<body><script>" + "x" * 500_000 + "</script><p>tiny</p></body>"
    assert run(html) == "tiny"


def test_span_offsets_are_utf8_bytes():
    res = extract_html("<body><p>héllo</p><p>wörld</p></body>".encode())
    s0, s1 = res.spans
    raw = res.text.encode("utf-8")
    assert raw[s0.start : s0.end].decode() == "héllo"
    assert raw[s1.start : s1.end].decode() == "wörld"
    assert s1.start == s0.end + 2  # "\n\n" separator


def test_span_kinds():
    res = extract_html(
        b"<body><h1>head</h1><li>item</li><td>cell</td><p>text</p></body>"
    )
    assert [s.kind for s in res.spans] == ["heading", "list_item", "table", "text"]


def test_block_char_cap_bounds_work():
    html = "<body><p>" + "word " * 100 + "</p></body>"
    out = run(html, max_block_chars=20)
    assert len(out) <= 20


def test_noscript_dropped():
    assert run("<body><noscript><p>nojs</p></noscript><p>real</p></body>") == "real"


def test_form_subtree_dropped():
    assert run("<body><form><input><button>go</button></form><p>real</p></body>") == "real"


def test_link_density_counts_capped_text_only():
    # block exceeds max_block_chars; ALL link text sits past the cap. The
    # density numerator must see the same capped text as the denominator
    # (pre-fix the numerator counted uncapped link text -> density > 1 and
    # a legitimately linkless kept-prefix was dropped).
    body = "x" * 30 + "<a href='/'>" + "link " * 20 + "</a>"
    out = run(f"<body><div>{body}</div></body>", max_block_chars=30)
    assert out == "x" * 30


def test_link_density_partial_cap_overlap():
    # cap cuts inside the link text: only the kept slice counts as link text
    html = "<body><div>aaaa <a href='/'>bbbb cccc</a></div></body>"
    # cap=7 keeps "aaaa bb" -> link share 2/6 nonws <= 0.5 -> kept
    assert run(html, max_block_chars=7) == "aaaa bb"


def test_markdown_mode_rendering():
    html = (
        "<body><h1>Top</h1><h3>Sub head</h3><li>item one</li>"
        "<pre>code here</pre><p>plain para</p></body>"
    )
    out = run(html, mode="markdown")
    assert out == (
        "# Top\n\n### Sub head\n\n- item one\n\n"
        "```\ncode here\n```\n\nplain para"
    )


def test_markdown_mode_spans_match_rendered_text():
    res = extract_html(b"<body><h2>head</h2><p>body</p></body>",
                       ExtractConfig(mode="markdown"))
    raw = res.text.encode("utf-8")
    for s in res.spans:
        assert raw[s.start : s.end].decode() == s.text
    assert res.spans[0].text == "## head"
    assert res.spans[0].kind == "heading"


def test_plain_mode_unchanged_by_default():
    assert run("<body><h2>head</h2><p>body</p></body>") == "head\n\nbody"
