"""Corpus-cleaning stages (operators/textstats.py): PII redaction
cascade and token-aligned chunking."""

from __future__ import annotations


def test_redact_pii_counts_and_rewrite(spark):
    from serenedb_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [(1, "mail a@b.co and c.d+x@e.org, call +1-555-1234, ip 10.0.0.1"),
         (2, "clean text with no identifiers"),
         (3, "1.2.3.4 then 5.6.7.8")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in TS.redact_pii(docs).collect()}
    assert rows[1].n_email == 2 and rows[1].n_phone == 1 \
        and rows[1].n_ipv4 == 1 and rows[1].n_redacted == 4
    assert "<EMAIL>" in rows[1].redacted \
        and "<PHONE>" in rows[1].redacted and "<IP>" in rows[1].redacted
    assert "a@b.co" not in rows[1].redacted
    assert rows[2].n_redacted == 0 \
        and rows[2].redacted == "clean text with no identifiers"
    assert rows[3].n_ipv4 == 2 and rows[3].redacted == "<IP> then <IP>"


def test_chunk_documents_cover_and_overlap(spark):
    from serenedb_spark.operators import textstats as TS

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, "only three words"), (3, "")],
        "doc_id long, text string")
    out = TS.chunk_documents(docs, chunk_tokens=4, overlap=1)
    rows = sorted([(r.doc_id, r.chunk_no, r.chunk_text, r.n_tokens)
                   for r in out.collect()])
    by_doc = {}
    for d, c, t, n in rows:
        by_doc.setdefault(d, []).append((c, t, n))
    # stride 3: starts 0,3,6 — the last chunk reaches w9, so no dangling
    # 4th chunk is emitted (n_chunks = floor((n-overlap-1)/stride)+1)
    assert [t for _, t, _n in by_doc[1]] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    # every token appears; consecutive chunks share `overlap` tokens
    assert by_doc[2] == [(0, "only three words", 3)]
    assert 3 not in by_doc  # empty doc -> no chunks

    import pytest

    with pytest.raises(ValueError):
        TS.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_short_doc_not_dropped(spark):
    """Docs with 1 <= n_tokens <= overlap must still emit ONE chunk: the
    bare formula floor((n-overlap-1)/stride)+1 evaluates to 0 there and
    the document would silently vanish from the corpus."""
    from serenedb_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "two words"), (3, "one two three four five six"),
         (4, "")],
        "doc_id long, text string")
    # chunk_tokens=24, overlap=6 — the registered gate params; docs 1-3
    # all have n <= overlap
    out = TS.chunk_documents(docs, chunk_tokens=24, overlap=6)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}  # empty doc still emits nothing
    assert rows[1].chunk_text == "tiny" and rows[1].n_tokens == 1
    assert rows[2].n_tokens == 2 and rows[3].n_tokens == 6
    assert all(r.chunk_no == 0 for r in rows.values())


def test_gopher_rules_linear_on_long_doc(spark):
    """The repetition rules must be a single sorted-array fold (O(n log n)
    per row), not the per-distinct-element re-filter (O(n²)): a 100k-word
    document with heavy 2-gram repetition has to evaluate in seconds —
    the quadratic shape is ~10^10 comparisons and would hang."""
    import time

    from serenedb_spark.operators import textstats as TS

    # 100k words: 50k copies of a repeated 2-gram + distinct filler, plus
    # 2k lines where half are duplicates — exercises both fold rules at
    # realistic web-document scale
    rep = ("lorem ipsum " * 25_000).strip()
    filler = " ".join(f"tok{i}" for i in range(50_000))
    lines = [f"line {i % 1000} repeated content" for i in range(2_000)]
    text = rep + " " + filler + "\n" + "\n".join(lines)
    assert len(text.split()) >= 100_000
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.perf_counter()
    row = TS.gopher_rules(df, min_words=5).collect()[0]
    dt = time.perf_counter() - t0
    # the quadratic shape took minutes-to-hours here; the fold takes ~1s.
    # generous bound so a loaded CI box never flakes
    assert dt < 30, f"gopher_rules took {dt:.1f}s on a 100k-word doc"
    # 'lorem ipsum' covers ~29% of chars -> top-2gram rule trips
    assert not row.r_top_2gram
    # 1000 of 2000 lines are duplicates -> dup-line rules trip
    assert not row.r_dup_lines


def test_gopher_repetition_rules(spark):
    from serenedb_spark.operators import textstats as TS

    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox",
             "golf", "hotel"]
    good = "the quick value of " + " ".join(
        f"item{i} {words[i]} point{i * 7}" for i in range(8)
    ) + " and that have be with"
    dup_lines = "\n".join(["same line of text here"] * 10 + ["one more bit"])
    rep_2gram = " ".join(["very common"] * 30) + " the and of that have be"
    df = spark.createDataFrame(
        [(1, good), (2, dup_lines), (3, rep_2gram)], "doc_id int, text string")
    got = {r["doc_id"]: r.asDict()
           for r in TS.gopher_rules(df, min_words=5).collect()}
    assert got[1]["r_dup_lines"] and got[1]["r_dup_line_chars"]
    assert got[1]["r_top_2gram"] and got[1]["keep"]
    # 10 identical lines -> dup fractions blow both thresholds
    assert not got[2]["r_dup_lines"] and not got[2]["r_dup_line_chars"]
    # one 2-gram covering most of the text
    assert not got[3]["r_top_2gram"] and not got[3]["keep"]
