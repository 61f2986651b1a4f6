"""Unit tests for prep.pii_scrub and prep.remove_boilerplate_lines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- pii_scrub


def test_pii_scrub_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (1, "reach me at jane.doe+x@sub.example.co.uk thanks"),
            (2, "call 555-123-4567 or 555.987.6543 now"),
            (3, "server 10.0.0.1 and 192.168.1.99 are up"),
            (4, "clean document with no pii at all"),
            (5, "mixed a@b.io 555-111-2222 127.0.0.1"),
        ],
    )
    out = {r["doc_id"]: r for r in prep.pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 0, 0)
    assert "<EMAIL>" in out[1]["clean_text"]
    assert "jane" not in out[1]["clean_text"]
    assert out[2]["n_phones"] == 2
    assert out[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_ips"] == 2
    assert out[3]["clean_text"] == "server <IP> and <IP> are up"
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ips"]) == (0, 0, 0)
    assert out[4]["clean_text"] == "clean document with no pii at all"
    assert out[5]["clean_text"] == "mixed <EMAIL> <PHONE> <IP>"


def test_pii_scrub_email_wins_overlap_and_counts_are_independent(spark):
    # an email whose domain EMBEDS an IP: email (applied first)
    # swallows the whole address in redaction, but the count detectors
    # fire independently on the original text
    docs = _docs(spark, [(1, "login user@10.0.0.1.example.com ok")])
    row = prep.pii_scrub(docs).first()
    assert row["clean_text"] == "login <EMAIL> ok"
    assert row["n_emails"] == 1
    assert row["n_ips"] == 1  # counted on the original text
    # a bare-IP "domain" has no alphabetic TLD -> NOT an email; the IP
    # pattern redacts just the address part
    row2 = prep.pii_scrub(_docs(spark, [(2, "login user@192.168.0.1 ok")])).first()
    assert row2["clean_text"] == "login user@<IP> ok"
    assert (row2["n_emails"], row2["n_ips"]) == (0, 1)


def test_pii_scrub_is_shuffle_free(spark):
    docs = _docs(spark, [(1, "a@b.io")])
    plan = prep.pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------- remove_boilerplate_lines


BP = "SUBSCRIBE TO OUR NEWSLETTER"
FOOT = "copyright 2026 example corp"


def _corpus(spark):
    rows = []
    for i in range(10):
        body = f"unique body line {i}"
        lines = [BP, body] if i < 6 else [body]
        if i % 2 == 0:
            lines.append(FOOT)  # df = 5
        rows.append((i, "\n".join(lines)))
    rows.append((100, BP))  # all-boilerplate doc: must disappear
    rows.append((101, None))  # null text: must disappear, not crash
    rows.append((102, "\n\nonly\n\nbody\n"))  # empty lines normalized away
    return _docs(spark, rows)


def _expected():
    exp = {}
    for i in range(10):
        removed = (1 if i < 6 else 0) + (1 if i % 2 == 0 else 0)
        exp[i] = (f"unique body line {i}", removed)
    exp[102] = ("only\nbody", 0)
    return exp


def test_boilerplate_removal_broadcast_path(spark):
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in prep.remove_boilerplate_lines(_corpus(spark), min_doc_freq=5).collect()
    }
    assert out == _expected()


def test_boilerplate_removal_join_path_identical(spark):
    # force the join fallback by shrinking the broadcast gate to zero
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in prep.remove_boilerplate_lines(
            _corpus(spark), min_doc_freq=5, max_dict_size=0
        ).collect()
    }
    assert out == _expected()


def test_boilerplate_threshold_boundary(spark):
    # FOOT has df exactly 5: df >= min_doc_freq removes it at 5, keeps at 6
    kept = prep.remove_boilerplate_lines(_corpus(spark), min_doc_freq=6)
    texts = {r["doc_id"]: r["clean_text"] for r in kept.collect()}
    assert FOOT in texts[0]
    assert BP not in texts[0]  # df 7 (docs 0-5 and doc 100) still removed


def test_boilerplate_min_doc_freq_validation(spark):
    with pytest.raises(ValueError):
        prep.remove_boilerplate_lines(_docs(spark, [(1, "x")]), min_doc_freq=1)


def test_boilerplate_preserves_line_order(spark):
    docs = _docs(
        spark,
        [
            (1, "z last\nCOMMON\na first\nCOMMON\nm middle"),
            (2, "COMMON\nother doc"),
        ],
    )
    for gate in (10_000, 0):  # both paths
        out = {
            r["doc_id"]: r
            for r in prep.remove_boilerplate_lines(
                docs, min_doc_freq=2, max_dict_size=gate
            ).collect()
        }
        assert out[1]["clean_text"] == "z last\na first\nm middle"
        assert out[1]["n_removed"] == 2
        assert out[2]["clean_text"] == "other doc"


def test_boilerplate_custom_separator_is_literal(spark):
    # '|' must be treated as a literal separator, not regex alternation
    docs = _docs(spark, [(1, "COMMON|keep me"), (2, "COMMON|other"), (3, "COMMON")])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in prep.remove_boilerplate_lines(docs, min_doc_freq=3, sep="|").collect()
    }
    assert out == {1: "keep me", 2: "other"}
