"""Algorithm-conformance kernels (conformance.py) vs DuckDB on edge-case
docs: null text, empty text, 1–3-token docs (short-gram fallback),
unicode, repeated tokens, and long docs."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from yaschva_ray.pipelines.conformance import (
    MINHASH_SIG_MD5_SQL,
    SIMHASH_MD5_SQL,
    WINNOW_MD5_SQL,
    minhash_sig_md5_batch,
    simhash_md5_batch,
    winnow_md5_batch,
)

EDGE_TEXTS = [
    None,
    "",
    "one",
    "two tokens",
    "exactly three tokens",
    "now four whole tokens",
    "the quick brown fox jumps over the lazy dog",
    "the the the the the the",          # all-duplicate tokens
    "naïve café über étude — ünïcödé tokens",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 3,
    "  leading and   trailing   spaces  ",
    "the quick brown fox jumps over the lazy dog",  # duplicate doc
]


@pytest.fixture(scope="module")
def edge_con():
    t = pa.table({"doc_id": pa.array(range(len(EDGE_TEXTS)), pa.int64()),
                  "text": pa.array(EDGE_TEXTS, pa.string())})
    con = duckdb.connect()
    con.register("documents", t)
    return con, t


def test_simhash_md5_matches_duckdb(edge_con):
    con, t = edge_con
    mine = simhash_md5_batch(t["text"])
    oracle = con.execute(SIMHASH_MD5_SQL).fetchdf()
    assert np.array_equal(oracle["simhash_md5"].to_numpy(), mine)
    # tokenless docs (null/empty text) are exactly 0 on both sides
    assert mine[0] == 0 and mine[1] == 0
    # duplicate docs get identical fingerprints
    assert mine[6] == mine[11]


def test_winnow_md5_matches_duckdb(edge_con):
    con, t = edge_con
    n_fp, dig = winnow_md5_batch(t["text"])
    oracle = con.execute(WINNOW_MD5_SQL).fetchdf()
    assert np.array_equal(oracle["n_fingerprints"].to_numpy(), n_fp)
    assert np.array_equal(oracle["fp_xor"].to_numpy(), dig)
    # every doc selects ≥ 1 fingerprint (short docs fall back to one gram)
    assert (n_fp >= 1).all()
    assert n_fp[6] == n_fp[11] and dig[6] == dig[11]


def test_minhash_sig_md5_matches_duckdb(edge_con):
    con, t = edge_con
    mins, k = minhash_sig_md5_batch(t["text"])
    oracle = con.execute(MINHASH_SIG_MD5_SQL).fetchdf()
    assert len(oracle) == len(EDGE_TEXTS) * k
    assert np.array_equal(oracle["sig"].to_numpy(), mins.ravel())
    # identical docs ⇒ identical signatures; distinct docs differ somewhere
    assert np.array_equal(mins[6], mins[11])
    assert not np.array_equal(mins[6], mins[9])


def test_conformance_queries_end_to_end(ray_session):
    """The three q_* wrappers run distributed and agree with DuckDB over
    the real sf0.01 table (the driver-sweep contract)."""
    from yaschva_ray.pipelines.conformance import (
        q_minhash_sig_md5,
        q_simhash_md5,
        q_winnow_md5,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")

    got = q_simhash_md5(sf)
    want = con.execute(SIMHASH_MD5_SQL).fetchdf()
    assert np.array_equal(got["simhash_md5"].to_numpy(),
                          want["simhash_md5"].to_numpy())

    got = q_winnow_md5(sf)
    want = con.execute(WINNOW_MD5_SQL).fetchdf()
    assert np.array_equal(got["fp_xor"].to_numpy(), want["fp_xor"].to_numpy())

    got = q_minhash_sig_md5(sf)
    want = con.execute(MINHASH_SIG_MD5_SQL).fetchdf()
    assert np.array_equal(got["sig"].to_numpy(), want["sig"].to_numpy())


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _texts = st.lists(
        st.one_of(st.none(),
                  st.text(alphabet=st.characters(
                      blacklist_categories=("Cs",)), max_size=60)),
        min_size=1, max_size=12)

    @settings(max_examples=30, deadline=None)
    @given(_texts)
    def test_conformance_kernels_match_duckdb_random(texts):
        """Randomized differential: arbitrary unicode (incl. whitespace-only
        and null docs) must agree with DuckDB on all three kernels."""
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        con = duckdb.connect()
        con.register("documents", t)
        assert np.array_equal(
            con.execute(SIMHASH_MD5_SQL).fetchdf()["simhash_md5"].to_numpy(),
            simhash_md5_batch(t["text"]))
        n_fp, dig = winnow_md5_batch(t["text"])
        o = con.execute(WINNOW_MD5_SQL).fetchdf()
        assert np.array_equal(o["n_fingerprints"].to_numpy(), n_fp)
        assert np.array_equal(o["fp_xor"].to_numpy(), dig)
        mins, k = minhash_sig_md5_batch(t["text"])
        o = con.execute(MINHASH_SIG_MD5_SQL).fetchdf()
        assert np.array_equal(o["sig"].to_numpy(), mins.ravel())
except ImportError:  # pragma: no cover
    pass
