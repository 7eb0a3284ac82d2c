"""Expression-level function tests, including equivalence between the
HOF expression forms (functions/) and the explode+aggregate operator
forms (operators/dedup.py) — two implementations of the same math that
must never drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.functions import (
    char_shingles,
    hamming64,
    minhash_signature,
    simhash_from_votes,
    simhash_votes,
    vec_cosine,
    vec_norm,
    vec_normalize,
    ws_tokens,
)
from realtime_cdc_pipeline_docker_spark.operators.dedup import (
    normalize_text,
    simhash_signatures,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the  QUICK   brown fox jumps over the lazy dog"),
    (3, "completely different content about deep sea life"),
    (4, "ab"),  # shorter than shingle k
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_minhash_expression_equals_operator_path(spark):
    """min over the HOF fold == min over the explode aggregate, slot by
    slot (same shingles, same affine family, same modulus)."""
    from realtime_cdc_pipeline_docker_spark.functions import _affine_params
    from realtime_cdc_pipeline_docker_spark.operators.dedup import shingle_hashes

    expr_sig = {
        r["doc_id"]: list(r["sig"])
        for r in _df(spark)
        .select(
            "doc_id",
            minhash_signature(char_shingles("text", 5), 32).alias("sig"),
        )
        .collect()
    }
    params = _affine_params(32)
    p = F.lit((1 << 31) - 1)
    op_sig = {
        r["id"]: [r[f"m{i}"] for i in range(32)]
        for r in shingle_hashes(_df(spark), "text", "doc_id", 5)
        .groupBy("id")
        .agg(
            *[
                F.min((F.col("h") * F.lit(a) + F.lit(b)) % p).alias(f"m{i}")
                for i, (a, b) in enumerate(params)
            ]
        )
        .collect()
    }
    assert expr_sig == op_sig
    # normalization-equivalent docs share the signature; different don't
    assert expr_sig[1] == expr_sig[2] != expr_sig[3]


def test_simhash_expression_equals_operator_path(spark):
    expr = {
        r["doc_id"]: r["sim"]
        for r in _df(spark)
        .select(
            "doc_id",
            simhash_from_votes(
                simhash_votes(ws_tokens(normalize_text("text")))
            ).alias("sim"),
        )
        .collect()
    }
    op = {r["id"]: r["sim"] for r in simhash_signatures(_df(spark)).collect()}
    assert expr == op
    assert expr[1] == expr[2] != expr[3]


def test_hamming64(spark):
    row = spark.range(1).select(
        hamming64(F.lit(0b1011).cast("long"), F.lit(0b0010).cast("long")).alias("h"),
        hamming64(F.lit(-1).cast("long"), F.lit(0).cast("long")).alias("h64"),
    ).collect()[0]
    assert row["h"] == 2 and row["h64"] == 64


def test_vector_algebra(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "v"])
    r = df.select(
        vec_norm("v").alias("n"),
        vec_cosine("v", "v").alias("self_sim"),
        vec_norm(vec_normalize("v")).alias("unit_n"),
    ).collect()[0]
    assert r["n"] == pytest.approx(5.0)
    assert r["self_sim"] == pytest.approx(1.0)
    assert r["unit_n"] == pytest.approx(1.0)


def test_redact_pii_planted(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import redact_pii

    rows = [
        (1, "write to alice.smith+news@mail-host.co.uk today"),
        (2, "dial 415-555-0142 or visit 192.168.1.254 now"),
        (3, "clean text with no identifiers at all"),
        (4, "a@b.io 1.2.3.4 999-999-9999"),
        (5, "not-a-phone 12-345-6789 and not-an-ip 1.2.3"),
    ]
    out = {
        r["doc_id"]: r
        for r in redact_pii(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["n_email"] == 1 and out[1]["text"] == "write to <EMAIL> today"
    assert out[2]["n_phone"] == 1 and out[2]["n_ipv4"] == 1
    assert out[2]["text"] == "dial <PHONE> or visit <IP> now"
    assert out[3]["text"] == rows[2][1]
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)
    assert out[4]["text"] == "<EMAIL> <IP> <PHONE>"
    # 12-345-6789 is not ddd-ddd-dddd; "1.2.3" has only three octets.
    assert (out[5]["n_phone"], out[5]["n_ipv4"]) == (0, 0)


def test_canonicalize_url_rules(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import canonicalize_url

    cases = [
        # case/port/fragment/trailing slash
        ("HTTPS://WWW.Example.COM:443/Docs/A/#frag", "https://www.example.com/Docs/A"),
        ("http://Host.org:80/", "http://host.org"),
        # path case is preserved
        ("https://h.io/CaseSensitive", "https://h.io/CaseSensitive"),
        # tracking params stripped wherever they sit; real params survive
        ("https://h.io/p?utm_source=a&page=2", "https://h.io/p?page=2"),
        ("https://h.io/p?page=2&utm_source=a", "https://h.io/p?page=2"),
        ("https://h.io/p?utm_a=1&utm_b=2", "https://h.io/p"),
        ("https://h.io/p?fbclid=xyz", "https://h.io/p"),
        # trailing slash before a query
        ("https://h.io/p/?page=2", "https://h.io/p?page=2"),
        # non-default port survives
        ("https://h.io:8443/p", "https://h.io:8443/p"),
        # ADVICE r4: a param merely CONTAINING utm_ is not tracking
        ("https://h.io/p?xutm_source=1&page=2", "https://h.io/p?xutm_source=1&page=2"),
        # ADVICE r4: default-port strip is scheme-aware — the OTHER
        # scheme's default is a distinct resource and survives
        ("http://h.io:443/p", "http://h.io:443/p"),
        ("https://h.io:80/p", "https://h.io:80/p"),
        # runs of tracking params collapse in one pass
        ("https://h.io/p?utm_a=1&utm_b=2&page=3", "https://h.io/p?page=3"),
        ("https://h.io/p?utm_a=1&x=2&utm_b=3", "https://h.io/p?x=2"),
        ("https://h.io/p?utm_a=1&utm_b=2&utm_c=3", "https://h.io/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    assert got == [want for _, want in cases]


def test_canonicalize_url_is_scan_side(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.text import canonicalize_url

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://x.io/"), F.col("doc_id")).alias("url")
    )
    plan = (
        docs.select(canonicalize_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_uri_scalars_edges(spark):
    from realtime_cdc_pipeline_docker_spark.functions import (
        uri_host,
        uri_path,
        uri_path_depth,
        uri_port,
        uri_query_param,
        uri_scheme,
        uri_tld,
    )

    cases = [
        # url, scheme, host, port, path, page, tld, depth
        ("https://api.Example.COM:8443/a/b/doc3?page=2&ref=x#f",
         "https", "api.Example.COM", 8443, "/a/b/doc3", "2", "COM", 3),
        ("http://www.example.org/a", "http", "www.example.org", None, "/a", None, "org", 1),
        # userinfo is not the host; absent path -> depth 0
        ("ftp://user:pw@host.io", "ftp", "host.io", None, "", None, "io", 0),
        # single-label host has no TLD; page param absent when empty-valued
        ("https://localhost:9000/x?page=", "https", "localhost", 9000, "/x", None, None, 1),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], ["url"])
    got = df.select(
        uri_scheme("url").alias("s"),
        uri_host("url").alias("h"),
        uri_port("url").alias("p"),
        uri_path("url").alias("pa"),
        uri_query_param("url", "page").alias("pg"),
        uri_tld("url").alias("t"),
        uri_path_depth("url").alias("d"),
    ).collect()
    for row, (_, *want) in zip(got, cases):
        assert tuple(row) == tuple(want), (tuple(row), want)
