"""Exact-substring dedup (hashed-window): span recovery, island merge,
cross-doc-only mode, hash-verify parity, and span stripping."""

from pyspark.sql import functions as F

from presto_bloomfilter_spark.operators import substring as ss

SENT = "zeta eta theta iota kappa lam mu nu xi omicron"  # 10 words


def _docs(spark):
    return spark.createDataFrame([
        (0, "a b c d e f g h i j " + SENT + " unique0 tail0"),
        (1, "k l m n o p q r s t " + SENT + " unique1 tail1"),
        (2, "plain words only here nothing shared at all among docs"),
        (3, "short doc"),
        (4, SENT + " " + SENT),   # intra-doc adjacent repeat
        (5, ""),
    ], "doc_id long, text string")


def test_duplicated_spans_recover_injected_overlap(spark):
    spans = {(r.id, r.start, r.end)
             for r in ss.duplicated_spans(_docs(spark), min_len=8).collect()}
    # the 10 shared words sit at word index 10..19 in docs 0 and 1
    assert ("0", 10, 20) in spans and ("1", 10, 20) in spans
    # doc4 = SENT+SENT: every window duplicated → one maximal span
    assert ("4", 0, 20) in spans
    # no spans for unshared / short / empty docs
    assert not any(i in ("2", "3", "5") for i, _, _ in spans)


def test_cross_doc_only_and_verify_parity(spark):
    docs = _docs(spark)
    base = sorted(map(tuple, ss.duplicated_spans(docs, min_len=8).collect()))
    ver = sorted(map(tuple, ss.duplicated_spans(docs, min_len=8, verify=True).collect()))
    assert base == ver
    cross = sorted(map(tuple,
                       ss.duplicated_spans(docs, min_len=8,
                                           cross_doc_only=True).collect()))
    assert ("0", 10, 20) in cross and ("1", 10, 20) in cross


def test_intra_doc_repeat_detected_only_without_cross_flag(spark):
    docs = spark.createDataFrame(
        [(0, SENT + " filler one two three four five six seven " + SENT),
         (1, "totally different content with no repeats whatsoever in here")],
        "doc_id long, text string")
    both = ss.duplicated_spans(docs, min_len=8).collect()
    assert {r.id for r in both} == {"0"}
    cross = ss.duplicated_spans(docs, min_len=8, cross_doc_only=True).collect()
    assert cross == []  # the repeat is within one doc


def test_strip_duplicated_spans_matches_python_reference(spark):
    docs = _docs(spark)
    stripped = {r.id: r.text
                for r in ss.strip_duplicated_spans(docs, min_len=8).collect()}
    spans = {}
    for r in ss.duplicated_spans(docs, min_len=8).collect():
        spans.setdefault(r.id, []).append((r.start, r.end))
    for row in docs.collect():
        rid = str(row.doc_id)
        words = row.text.split()
        keep = [w for i, w in enumerate(words)
                if not any(s <= i < e for s, e in spans.get(rid, []))]
        assert stripped[rid] == " ".join(keep), rid
    # untouched docs pass through byte-identical (not re-joined words)
    assert stripped["2"] == "plain words only here nothing shared at all among docs"
    assert stripped["4"] == ""


def test_word_indices_follow_str_split_despite_edge_whitespace(spark):
    """Spark's trim() removes only 0x20 spaces — a leading newline/tab
    must NOT shift span indices off Python str.split() numbering."""
    docs = spark.createDataFrame(
        [(0, "\n\ta0 b0 " + SENT + " t0"),
         (1, "a1 b1 " + SENT + " t1\n"),
         (2, SENT + " other words")],
        "doc_id long, text string")
    spans = {r.id: (r.start, r.end)
             for r in ss.duplicated_spans(docs, min_len=8).collect()}
    # str.split() puts SENT at words 2..11 in docs 0/1 and 0..9 in doc 2
    assert spans["0"] == (2, 12) and spans["1"] == (2, 12)
    assert spans["2"] == (0, 10)
    stripped = {r.id: r.text
                for r in ss.strip_duplicated_spans(docs, min_len=8).collect()}
    assert stripped["0"] == "a0 b0 t0"  # no empty-word artifacts


def test_spans_scale_posture_no_python_in_plan(spark):
    """The whole detector is Catalyst: no Python workers anywhere in
    the plan (mapInPandas/BatchEvalPython absent)."""
    plan = (ss.duplicated_spans(_docs(spark), min_len=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan


# ---------------- maximal exact matches (MEM / suffix-array output) ----


def _mem_docs(spark):
    X = " ".join(f"x{i}" for i in range(8))
    Y = " ".join(f"y{i}" for i in range(8))
    C = " ".join(f"c{i}" for i in range(8))
    return spark.createDataFrame([
        ("d1", X + " " + Y),   # X then Y adjacent: fused by windows
        ("d2", "zz " + X),     # X only, shifted one word
        ("d3", Y + " ww"),     # Y only
        ("d4", C + " " + C),   # within-doc tandem repeat
    ], "doc_id string, text string")


def test_mem_pins_exact_boundaries_where_windows_fuse(spark):
    """The hashed-window span in d1 is one fused [0,16) region; MEMs
    separate it into the two underlying repeats with their partner
    occurrences and exact lengths — the suffix-array-only output."""
    docs = _mem_docs(spark)
    mems = sorted(map(tuple,
                      ss.maximal_exact_matches(docs, min_len=8).collect()))
    assert mems == [("d1", 0, "d2", 1, 8),
                    ("d1", 8, "d3", 0, 8),
                    ("d4", 0, "d4", 8, 8)]
    spans = sorted(map(tuple,
                       ss.duplicated_spans(docs, min_len=8)
                       .filter("id = 'd1'").collect()))
    assert spans == [("d1", 0, 16)]  # the fused form, for contrast


def test_mem_long_match_and_maximality(spark):
    """A 12-word shared region → ONE MEM of len 12 (not five 8-word
    ones); differing flank words bound it exactly."""
    R = " ".join(f"r{i}" for i in range(12))
    docs = spark.createDataFrame([
        ("a", "left1 " + R + " right1"),
        ("b", "left2 " + R + " right2"),
    ], "doc_id string, text string")
    mems = sorted(map(tuple,
                      ss.maximal_exact_matches(docs, min_len=8).collect()))
    assert mems == [("a", 1, "b", 1, 12)]


def test_mem_occurrence_cap_and_verify_parity(spark):
    docs = _mem_docs(spark)
    assert ss.maximal_exact_matches(docs, min_len=8,
                                    max_occurrences=1).count() == 0
    base = sorted(map(tuple,
                      ss.maximal_exact_matches(docs, min_len=8).collect()))
    ver = sorted(map(tuple,
                     ss.maximal_exact_matches(docs, min_len=8,
                                              verify=True).collect()))
    assert base == ver


def test_mem_three_occurrences_all_pairs(spark):
    """f occurrences of a repeat → all C(f,2) ordered MEM pairs."""
    S = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [("a", S + " ta"), ("b", S + " tb"), ("c", S + " tc")],
        "doc_id string, text string")
    mems = sorted(map(tuple,
                      ss.maximal_exact_matches(docs, min_len=8).collect()))
    assert mems == [("a", 0, "b", 0, 8),
                    ("a", 0, "c", 0, 8),
                    ("b", 0, "c", 0, 8)]


def test_mem_scale_posture_no_python_in_plan(spark):
    plan = (ss.maximal_exact_matches(_mem_docs(spark), min_len=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
