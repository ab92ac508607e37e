"""Line-level boilerplate removal (operators/dedup.remove_boilerplate_lines):
planted cross-document footer lines are cut, short/structural lines and
unique lines survive verbatim, and results match a pure-Python twin."""

from __future__ import annotations

import random
from collections import defaultdict

from kg_microbe_merge_spark.operators.dedup import remove_boilerplate_lines


def py_twin(docs, min_df=2, min_line_chars=5):
    freq = defaultdict(set)
    for doc_id, text in docs:
        for ln in text.split("\n"):
            key = ln.strip()
            if len(key) >= min_line_chars:
                freq[key].add(doc_id)
    flagged = {k for k, s in freq.items() if len(s) >= min_df}
    out = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept = [
            ln
            for ln in lines
            if not (
                len(ln.strip()) >= min_line_chars and ln.strip() in flagged
            )
        ]
        out[doc_id] = (
            "\n".join(kept),
            len(lines),
            len(lines) - len(kept),
        )
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, **kw).collect()
    }


def test_planted_footer_removed(spark):
    footer = "copyright 2026 example corp all rights reserved"
    docs = [
        ("d1", f"unique alpha content one\n{footer}\nmore alpha"),
        ("d2", f"unique beta content two\n  {footer}  \nmore beta"),
        ("d3", "entirely unique gamma\nno footer here at all"),
    ]
    got = _run(spark, docs)
    # footer cut from both docs (trim-normalized match), unique lines kept
    assert got["d1"] == ("unique alpha content one\nmore alpha", 3, 1)
    assert got["d2"] == ("unique beta content two\nmore beta", 3, 1)
    assert got["d3"] == (docs[2][1], 2, 0)


def test_short_lines_never_counted_or_removed(spark):
    # "ok" repeats everywhere but is under min_line_chars — structural
    docs = [("a", "ok\nlong unique line aa"), ("b", "ok\nlong unique bb")]
    got = _run(spark, docs, min_line_chars=5)
    assert got["a"] == (docs[0][1], 2, 0)
    assert got["b"] == (docs[1][1], 2, 0)


def test_within_doc_repeat_is_not_cross_doc(spark):
    # same line 3x inside ONE doc: doc frequency is 1 -> never flagged
    docs = [("a", "repeat me often\nrepeat me often\nrepeat me often")]
    got = _run(spark, docs)
    assert got["a"] == (docs[0][1], 3, 0)


def test_matches_python_twin_random(spark):
    rng = random.Random(7)
    pool = [f"shared line number {i} with payload" for i in range(6)]
    docs = []
    for d in range(20):
        lines = [f"unique {d} line {j} {rng.random():.6f}" for j in range(3)]
        lines += rng.sample(pool, rng.randint(0, 3))
        lines += ["", "x"] if rng.random() < 0.5 else []
        rng.shuffle(lines)
        docs.append((f"d{d}", "\n".join(lines)))
    for min_df in (2, 4):
        assert _run(spark, docs, min_df=min_df) == py_twin(
            docs, min_df=min_df
        ), min_df
