"""tools/gen_scale_data.py — the scaling-rehearsal dataset generator.

Contracts worth pinning: (1) schema parity with the driver fixtures
(name + DuckDB type per column, since bench_scaling runs the SAME query
code against both); (2) bit-reproducibility (all randomness is
hash(i)-derived — two runs must produce identical files); (3) row
counts scale linearly from the sf0.1 base; (4) the domains queries
filter on (label sets, key ranges) match the fixtures.

Pure DuckDB — no Spark session needed.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

REF = "/root/testdata/sf0.1"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    from gen_scale_data import generate

    out = str(tmp_path_factory.mktemp("gen") / "sf001")
    generate(0.001, out, REF)
    return out


def test_schema_parity_with_fixtures(gen_dir):
    con = duckdb.connect()
    for t in TABLES:
        got = con.execute(
            "DESCRIBE SELECT * FROM read_parquet(?)",
            [os.path.join(gen_dir, f"{t}.parquet")]).fetchall()
        want = con.execute(
            "DESCRIBE SELECT * FROM read_parquet(?)",
            [os.path.join(REF, f"{t}.parquet")]).fetchall()
        assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in want], t


def test_row_counts_scale_linearly(gen_dir):
    con = duckdb.connect()

    def n(d, t):
        return con.execute("SELECT count(*) FROM read_parquet(?)",
                           [os.path.join(d, f"{t}.parquet")]).fetchone()[0]

    # fixed dimensions copied verbatim; fact tables at 1/100 of sf0.1
    assert n(gen_dir, "region") == 5 and n(gen_dir, "nation") == 25
    for t, base in (("customer", 15000), ("orders", 150000),
                    ("events", 100000), ("documents", 5000),
                    ("embeddings", 2000)):
        assert n(gen_dir, t) == base // 100, t
    # lineitem: 1..7 lines per order over 1500 orders, avg 4 => ~6000
    # +- sampling noise (explicit bounds — the r11 form had a
    # floor-div precedence slip that evaluated the lower bound to 48)
    li = n(gen_dir, "lineitem")
    assert 0.8 * 6000 <= li <= 1.2 * 6000, li


def test_deterministic_across_runs(gen_dir, tmp_path):
    from gen_scale_data import generate

    out2 = str(tmp_path / "again")
    generate(0.001, out2, REF)
    for t in TABLES:
        # compare CONTENT hashes via duckdb (parquet bytes may embed
        # writer metadata; the data contract is value-level identity)
        con = duckdb.connect()
        h1 = con.execute(
            "SELECT count(*), sum(hash(CAST(t AS VARCHAR))) FROM "
            "read_parquet(?) t", [os.path.join(gen_dir, f"{t}.parquet")]
        ).fetchone()
        h2 = con.execute(
            "SELECT count(*), sum(hash(CAST(t AS VARCHAR))) FROM "
            "read_parquet(?) t", [os.path.join(out2, f"{t}.parquet")]
        ).fetchone()
        assert h1 == h2, t


def test_query_domains_match_fixtures(gen_dir):
    con = duckdb.connect()

    def dom(d, t, col):
        return set(r[0] for r in con.execute(
            f"SELECT DISTINCT {col} FROM read_parquet(?)",
            [os.path.join(d, f"{t}.parquet")]).fetchall())

    for t, col in (("orders", "o_orderstatus"),
                   ("orders", "o_orderpriority"),
                   ("customer", "c_mktsegment"),
                   ("lineitem", "l_returnflag"),
                   ("events", "event_type"),
                   ("documents", "lang"),
                   ("part", "p_type")):
        assert dom(gen_dir, t, col) <= dom(REF, t, col), (t, col)
    # embeddings: dim 64, labels 0..9 (subset at tiny SF)
    dims = con.execute(
        "SELECT DISTINCT len(embedding) FROM read_parquet(?)",
        [os.path.join(gen_dir, "embeddings.parquet")]).fetchall()
    assert dims == [(64,)]


def test_doc_vocab_heaps_growth():
    """Vocabulary contract (r12): at or below the sf0.1 base the document
    vocabulary is EXACTLY the fixture's 31 words (domain parity with the
    driver testdata); above it, it grows ~sqrt(n) (Heaps' law) with the
    fixture words as a stable prefix — a fixed vocabulary at 50x makes
    the ground-truth near-dup pair count itself quadratic, which is a
    broken benchmark input, not a hard one (see doc_vocab docstring)."""
    from gen_scale_data import BASE, VOCAB, doc_vocab

    base = BASE["documents"]
    assert doc_vocab(base // 100) == list(VOCAB)
    assert doc_vocab(base) == list(VOCAB)
    for mult in (10, 50):
        v = doc_vocab(base * mult)
        assert v[: len(VOCAB)] == list(VOCAB)          # stable prefix
        assert len(v) == round(len(VOCAB) * mult ** 0.5)
        assert len(set(v)) == len(v)                   # no collisions
        # token shape unchanged: lowercase alnum, whitespace-safe
        assert all(w.isalnum() and w == w.lower() for w in v)


def test_emb_cluster_count_grows_linearly_past_base():
    """Embedding cluster contract (r12, companion to doc_vocab): at or
    below the sf0.1 base the generator uses the fixture's literal 10
    centroids (byte-identical SQL); above it, cluster count grows
    linearly so cluster SIZE holds at ~200 rows — a fixed 10 clusters
    at 50x makes the ground-truth near-dup pair count itself quadratic
    (see emb_clusters docstring)."""
    from gen_scale_data import BASE, emb_clusters

    base = BASE["embeddings"]
    assert emb_clusters(base // 100) == 10
    assert emb_clusters(base) == 10
    assert emb_clusters(base * 10) == 100
    assert emb_clusters(base * 50) == 500
    # cluster size stays at the base's ~200 rows
    for mult in (2, 10, 50):
        n = base * mult
        assert abs(n / emb_clusters(n) - base / 10) < 1
