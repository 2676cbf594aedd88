"""HTML extraction: unit edge cases + per-url byte-identical invariant."""

from __future__ import annotations

import pyarrow.parquet as pq

from terrier_ray.extract.html import HtmlExtractor, extract_text_reference


def test_basic_tags():
    html = b"<html><body><h1>Title Here</h1><p>hello world</p></body></html>"
    assert extract_text_reference(html) == "Title Here\nhello world"


def test_script_style_comment_stripped():
    html = (
        b"<head><style>p {x}</style><script>var a = 1 < 2;</script></head>"
        b"<!-- a comment with <p>fake</p> --><p>real</p>"
    )
    assert extract_text_reference(html) == "real"


def test_entities_unescaped():
    assert extract_text_reference(b"<p>a &amp; b &lt;c&gt; &#39;d&#39;</p>") == "a & b <c> 'd'"


def test_inline_tags_no_break():
    assert extract_text_reference(b"<p>go <a href='x'>here</a> <b>now</b></p>") == "go here now"


def test_whitespace_collapsed():
    assert extract_text_reference(b"<p>a   b\t c</p>\n\n<p>  </p><p>d</p>") == "a b c\nd"


def test_empty_and_none():
    assert extract_text_reference(b"") == ""
    assert extract_text_reference(None) == ""
    assert extract_text_reference(b"<html><body> \n\t </body></html>") == ""


def test_unterminated_script():
    assert extract_text_reference(b"<p>keep</p><script>lost()") == "keep"


def test_malformed_unclosed_tag():
    assert extract_text_reference(b"<p>one<p>two") == "one\ntwo"


def test_invalid_utf8():
    out = extract_text_reference(b"<p>ok \xff\xfe</p>")
    assert out.startswith("ok")


def test_pipeline_matches_reference_per_url(ray_session, webtext_small):
    """The invariant gate: pipeline text == reference extractor text, per url."""
    import ray.data as rd

    ds = rd.read_parquet(webtext_small)
    out = ds.map_batches(
        HtmlExtractor, batch_format="pyarrow", batch_size=256, concurrency=2
    ).to_pandas()
    raw = pq.read_table(webtext_small).to_pandas()
    ref = {
        (u, ts): extract_text_reference(h)
        for u, ts, h in zip(raw["url"], raw["warc_ts"], raw["html"])
    }
    assert len(out) == len(raw)
    assert "html" not in out.columns
    for _, row in out.iterrows():
        expected = ref[(row["url"], row["warc_ts"])]
        assert row["text"].encode() == expected.encode(), row["url"]


def test_pre_extracted_text_kept(ray_session, webtext_small):
    raw = pq.read_table(webtext_small)
    pre = raw.to_pandas()
    pre_rows = pre[pre["text"] != ""]
    assert len(pre_rows) > 0  # fixture exercises the pre-extracted path
    for _, row in pre_rows.iterrows():
        assert row["text"] == extract_text_reference(row["html"])
