"""Late round-4 operators: inverted-index keyword search, global-quantile
quality filter, rollup aggregate."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _write_docs(tmp_path, texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(x or "") for x in texts],
                                      pa.int64())})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))


def test_keyword_search_ranks_planted_doc_first(ray_session, tmp_path):
    from yaschva_ray.pipelines.textops import (
        _KWSEARCH_QUERY,
        inverted_index_build,
        keyword_search,
    )

    texts = (["filler words only here nothing relevant"] * 20
             + [" ".join(_KWSEARCH_QUERY)]              # all 4 -> rank 1
             + ["spark window merge text", "spark window",  # 3, 2 matches
                "quantile alone"])                         # 1 match
    _write_docs(tmp_path, texts)
    idx = os.path.join(tmp_path, "idx")
    inverted_index_build(str(tmp_path), idx, num_buckets=4)
    # partition-pruned layout: one hive dir per bucket + meta
    assert os.path.exists(os.path.join(idx, "meta.json"))
    assert any(d.startswith("bucket=") for d in os.listdir(idx))

    out = keyword_search(idx, _KWSEARCH_QUERY, k=3)
    assert out["doc_id"].to_pylist() == [20, 21, 22]
    assert out["n_matched"].to_pylist() == [4, 3, 2]
    # duplicate tokens in a doc count once (distinct postings)
    out2 = keyword_search(idx, ("spark",), k=2)
    assert out2["n_matched"].to_pylist()[0] == 1


def test_keyword_search_reads_only_query_buckets(ray_session, tmp_path):
    """Pruning contract: buckets not hit by the query are never opened."""
    from yaschva_ray.pipelines.textops import (
        inverted_index_build,
        keyword_search,
    )

    _write_docs(tmp_path, ["alpha beta", "beta gamma", "delta"])
    idx = os.path.join(tmp_path, "idx2")
    inverted_index_build(str(tmp_path), idx, num_buckets=8)
    # corrupt every bucket EXCEPT the ones 'alpha' routes to: a search
    # for 'alpha' must still succeed (it never reads the corrupted dirs)
    from yaschva_ray.engine.sketches import _hash64

    keep = int((_hash64(pa.array(["alpha"])) % np.uint64(8))[0])
    for d in os.listdir(idx):
        if d.startswith("bucket=") and d != f"bucket={keep}":
            for f in os.listdir(os.path.join(idx, d)):
                with open(os.path.join(idx, d, f), "wb") as fh:
                    fh.write(b"not parquet")
    out = keyword_search(idx, ("alpha",), k=5)
    assert out["doc_id"].to_pylist() == [0]


def test_quality_filter_threshold_semantics(ray_session, tmp_path):
    from yaschva_ray.pipelines.ops import q_quality_filter

    # token counts 1..8 -> p75 rank floor(0.75*7)=5 (zero-based) -> value 6
    _write_docs(tmp_path, ["w " * n for n in range(1, 9)])
    out = q_quality_filter(str(tmp_path))
    assert out["n_tokens"].to_pylist() == [6, 7, 8]


def test_events_rollup_levels_consistent(ray_session):
    from yaschva_ray.pipelines.ops import q_events_rollup

    out = q_events_rollup(SF_DIR)
    df = out.to_pandas()
    grand = df[(df.event_type == "ALL")]
    assert len(grand) == 1
    per_type = df[(df.event_type != "ALL") & (df.hour == "ALL")]
    fine = df[(df.event_type != "ALL") & (df.hour != "ALL")]
    assert per_type.n_events.sum() == grand.n_events.iloc[0] == fine.n_events.sum()
    assert per_type.sum_value_cents.sum() == grand.sum_value_cents.iloc[0]


def test_grouped_quantiles_match_numpy(ray_session):
    import duckdb

    from yaschva_ray.pipelines.ops import q_grouped_quantiles

    out = q_grouped_quantiles(SF_DIR).to_pandas().set_index("event_type")
    con = duckdb.connect()
    df = con.execute(
        f"SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents "
        f"FROM read_parquet('{SF_DIR}/events.parquet')").fetchdf()
    for et, grp in df.groupby("event_type"):
        vals = np.sort(grp.cents.to_numpy())
        for q, col in ((0.5, "p50_cents"), (0.9, "p90_cents")):
            assert out.loc[et, col] == vals[int(np.floor(q * (len(vals) - 1)))]


def test_compact_parquet_resume_and_conservation(ray_session, tmp_path):
    from yaschva_ray.engine.compact import compact_parquet

    for i in range(6):
        t = pa.table({"doc_id": pa.array(range(i * 10, i * 10 + 10),
                                         pa.int64())})
        pq.write_table(t, os.path.join(tmp_path, f"in-{i}.parquet"))
    out = os.path.join(tmp_path, "out")
    sz = os.path.getsize(os.path.join(tmp_path, "in-0.parquet"))
    r1 = compact_parquet(str(tmp_path), out, target_bytes=sz * 3)
    assert r1["rows"] == 60 and r1["n_out"] < 6 and r1["skipped"] == 0
    parts = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    got = pa.concat_tables([pq.read_table(os.path.join(out, p))
                            for p in parts])
    assert sorted(got["doc_id"].to_pylist()) == list(range(60))
    # resume: a rerun rewrites nothing (every group in the manifest)
    mtimes = {p: os.path.getmtime(os.path.join(out, p)) for p in parts}
    r2 = compact_parquet(str(tmp_path), out, target_bytes=sz * 3)
    assert r2["skipped"] == r1["n_out"] and r2["rows"] == 60
    assert all(os.path.getmtime(os.path.join(out, p)) == mtimes[p]
               for p in parts)


def test_infer_schema_roundtrip_validates(ray_session):
    """Every row of the table must pass validation against the schema
    inferred FROM that table; a type-violating mutation must fail."""
    import json

    from yaschva_ray.pipelines.ops import q_infer_schema
    from yaschva_ray.vectorized import TableValidator

    inferred = {r["column"]: json.loads(r["inferred"])
                for r in q_infer_schema(SF_DIR).to_pylist()}
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    tv = TableValidator(inferred)
    out = tv(t)
    assert out["valid"].to_pandas().all()
    # mutate one column's type -> every row fails
    bad = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                       pa.array(["x"] * t.num_rows))
    assert not TableValidator(inferred)(bad)["valid"].to_pandas().any()


def test_compact_refuses_mixed_plans(ray_session, tmp_path):
    """Resuming into an out_dir built under a different plan (input set or
    target changed) must fail loudly, not mix stale parts."""
    from yaschva_ray.engine.compact import compact_parquet

    for i in range(3):
        pq.write_table(pa.table({"doc_id": pa.array([i], pa.int64())}),
                       os.path.join(tmp_path, f"in-{i}.parquet"))
    out = os.path.join(tmp_path, "out")
    compact_parquet(str(tmp_path), out, target_bytes=1)
    pq.write_table(pa.table({"doc_id": pa.array([99], pa.int64())}),
                   os.path.join(tmp_path, "in-3.parquet"))
    with pytest.raises(RuntimeError, match="different\\s+plan"):
        compact_parquet(str(tmp_path), out, target_bytes=1)


def test_ppm_codec_roundtrip_and_real_decode():
    """Pure-numpy P6 codec: encode->decode round trip (incl. header
    comments), and the decoder tiers produce REAL pixel-derived outputs:
    a constant image's features/pixels are that constant."""
    from yaschva_ray.pipelines.multimodal import (
        FEATURE_DIM,
        RESIZE_H,
        RESIZE_W,
        MediaFeatureExtractor,
        MediaResizer,
        decode_ppm,
        encode_ppm,
    )

    px = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    buf = encode_ppm(px)
    out, end = decode_ppm(buf)
    assert np.array_equal(out, px) and end == len(buf)
    out2, _ = decode_ppm(b"P6\n# comment\n8 6\n255\n" + px.tobytes())
    assert np.array_equal(out2, px)

    flat = np.full((16, 16, 3), 77, np.uint8)
    batch = pa.table({"media_ref": pa.array(["m"]),
                      "kind": pa.array(["image"]),
                      "payload": pa.array([encode_ppm(flat)], pa.binary())})
    feat = MediaFeatureExtractor(decoder="ppm")(batch)
    assert feat["feature"][0].as_py() == [77.0] * FEATURE_DIM
    pxo = MediaResizer(decoder="ppm")(batch)
    assert pxo["pixels"][0].as_py() == [77.0] * (RESIZE_H * RESIZE_W)
    # undecodable bytes -> zeros (loud in value, not a crash)
    bad = pa.table({"media_ref": pa.array(["b"]), "kind": pa.array(["image"]),
                    "payload": pa.array([b"\x00\x01junk"], pa.binary())})
    assert MediaFeatureExtractor(decoder="ppm")(bad)["feature"][0].as_py() \
        == [0.0] * FEATURE_DIM


def test_frame_sampler_decodes_real_ppm_frames(ray_session):
    """Videos = concatenated P6 frames: the sampler walks headers, samples
    evenly over the ACTUAL frame count, and each emitted feature equals a
    direct decode of that frame."""
    from yaschva_ray.pipelines.multimodal import (
        VIDEO_FRAMES,
        FrameSampler,
        _pool_gray,
        decode_ppm,
        synth_media_table,
    )

    t = synth_media_table(48, seed=3)
    fr = FrameSampler(n_frames=4)(t)
    kinds = t["kind"].to_pylist()
    vid_rows = [i for i, k in enumerate(kinds) if k == "video"]
    assert fr.num_rows == len(vid_rows) * 4
    i = vid_rows[0]
    payload = t["payload"][i].as_py()
    bounds, pos = [], 0
    while pos < len(payload):
        _, end = decode_ppm(payload, pos)
        bounds.append(pos)
        pos = end
    assert len(bounds) == VIDEO_FRAMES
    ref = t["media_ref"][i].as_py()
    for f in range(4):
        expected = _pool_gray(
            decode_ppm(payload, bounds[(len(bounds) * f) // 4])[0], 4, 4
        ).ravel()
        got = [r["feature"] for r in fr.to_pylist()
               if r["media_ref"] == ref and r["frame_idx"] == f][0]
        assert np.allclose(got, expected)


def test_wav_codec_and_audio_features():
    """Pure-numpy WAV codec: round trip (incl. an extra RIFF chunk before
    data), and audio features derive from the REAL samples: a silent clip
    yields zero RMS, a loud one does not."""
    import struct

    from yaschva_ray.pipelines.multimodal import (
        FEATURE_DIM,
        MediaFeatureExtractor,
        decode_wav,
        encode_wav,
    )

    x = (np.sin(np.arange(2048) / 10.0) * 20000).astype(np.int16)
    buf = encode_wav(x, 16000)
    got, rate = decode_wav(buf)
    assert rate == 16000 and np.array_equal(got, x)
    # tolerate an extra chunk between fmt and data (real-world files)
    extra = buf[:36] + struct.pack("<4sI", b"LIST", 4) + b"INFO" + buf[36:]
    got2, _ = decode_wav(bytes(extra))
    assert np.array_equal(got2, x)

    def feats(samples):
        b = pa.table({"media_ref": pa.array(["a"]),
                      "kind": pa.array(["audio"]),
                      "payload": pa.array([encode_wav(samples)], pa.binary())})
        return np.array(MediaFeatureExtractor(decoder="ppm")(b)
                        ["feature"][0].as_py())

    silent = feats(np.zeros(1024, np.int16))
    assert np.allclose(silent[: FEATURE_DIM // 2], 0.0)
    loud = feats(x)
    assert (loud[: FEATURE_DIM // 2] > 0.1).all()
    # undecodable bytes -> zeros
    bad = pa.table({"media_ref": pa.array(["b"]), "kind": pa.array(["audio"]),
                    "payload": pa.array([b"junkbytes"], pa.binary())})
    assert MediaFeatureExtractor(decoder="ppm")(bad)["feature"][0].as_py() \
        == [0.0] * FEATURE_DIM


def test_media_integrity_check(ray_session):
    """Planted corruption is caught with stable error strings; the clean
    synth table validates clean."""
    import ray.data

    from yaschva_ray.pipelines.multimodal import (
        check_media_integrity,
        synth_media_table,
    )

    t = synth_media_table(64, seed=5)
    clean = check_media_integrity(ray.data.from_arrow(t)).to_pandas()
    assert len(clean) == 0

    df = t.to_pandas()
    img = df.index[df.kind == "image"][0]
    aud = df.index[df.kind == "audio"][0]
    vid = df.index[df.kind == "video"][0]
    df.loc[img, "width"] = df.loc[img, "width"] + 1          # lie about dims
    df.loc[aud, "duration_ms"] = df.loc[aud, "duration_ms"] + 500
    df.at[vid, "payload"] = b"corrupted" + df.at[vid, "payload"][9:]
    bad = check_media_integrity(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    ).to_pandas().set_index("media_ref")
    assert bad.loc[df.loc[img, "media_ref"], "error"] \
        == "width metadata mismatch"
    assert bad.loc[df.loc[aud, "media_ref"], "error"] \
        == "duration metadata mismatch"
    assert bad.loc[df.loc[vid, "media_ref"], "error"] \
        == "payload does not decode"
    assert len(bad) == 3


def _ref_bpe(word_counts, n_merges):
    """Independent brute-force Sennrich reference (dict/loop form)."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for w, cnt in word_counts.items():
            seq = vocab[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] = \
                    pairs.get((seq[i], seq[i + 1]), 0) + cnt
        if not pairs:
            break
        best = max(pairs.values())
        if best < 2:
            break
        left, right = sorted(p for p, c in pairs.items() if c == best)[0]
        merges.append((rank, left, right, left + right, best))
        for w in vocab:
            seq, new, i = vocab[w], [], 0
            while i < len(seq):
                if (i < len(seq) - 1 and seq[i] == left
                        and seq[i + 1] == right):
                    new.append(left + right)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            vocab[w] = new
    return merges


def test_bpe_train_matches_bruteforce_reference():
    from yaschva_ray.pipelines.bpe import bpe_encode, bpe_train

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    t = pa.table({"word": pa.array(list(wc)),
                  "n": pa.array(list(wc.values()), pa.int64())})
    got = bpe_train(t, n_merges=10)
    want = _ref_bpe(wc, 10)
    assert [tuple(r.values()) for r in got.to_pylist()] == want
    # the paper's corpus learns ('e','s') then ('es','t') first
    assert got["merged"].to_pylist()[:2] == ["es", "est"]
    # greedy lowest-rank encode segments concatenate back to the word
    ranks = {(r["left"], r["right"]): r["rank"] for r in got.to_pylist()}
    for w in wc:
        segs = bpe_encode(w, ranks)
        assert "".join(segs) == w and len(segs) < len(w)


def test_bpe_distributed_word_counts_and_train(ray_session):
    """Word counting runs through the exchange and matches DuckDB; the
    trainer over real corpus counts matches the brute-force reference."""
    import duckdb

    from yaschva_ray.pipelines.bpe import bpe_train, word_counts_from_ds
    from yaschva_ray.pipelines.textops import _read

    wc = word_counts_from_ds(_read(SF_DIR, "documents", ["doc_id", "text"]))
    con = duckdb.connect()
    want = con.execute(rf"""
        WITH t AS (
            SELECT unnest(regexp_extract_all(coalesce(text,''), '\S+'))
                AS word
            FROM read_parquet('{SF_DIR}/documents.parquet')
        )
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY word ORDER BY word
    """).fetchdf()
    # DuckDB's unnest+group mirror must agree exactly
    assert wc["word"].to_pylist() == want["word"].tolist()
    assert wc["n"].to_pylist() == want["n"].tolist()

    got = bpe_train(wc, n_merges=16)
    ref = _ref_bpe(dict(zip(wc["word"].to_pylist(), wc["n"].to_pylist())), 16)
    assert [tuple(r.values()) for r in got.to_pylist()] == ref


def test_bpe_distributed_encode_matches_reference(ray_session):
    """Tokenizer APPLICATION: the actor-pool encode over the corpus must
    equal the per-word reference bpe_encode doc by doc (any batch/actor
    split), nulls and empty docs counting zero tokens."""
    import polars as pl
    import ray.data

    from yaschva_ray.pipelines.bpe import (BpeEncoder, bpe_encode,
                                           bpe_train, tokenize_ds,
                                           word_counts_from_ds)
    from yaschva_ray.pipelines.textops import TOKEN_RE, _read
    from yaschva_ray.engine.blocks import gather_tables

    ds = _read(SF_DIR, "documents", ["doc_id", "text"])
    merges = bpe_train(word_counts_from_ds(ds), n_merges=24)
    got = pa.concat_tables(
        [t for t in gather_tables(tokenize_ds(ds, merges,
                                              batch_size=64))
         if t.num_rows]).sort_by([("doc_id", "ascending")])

    full = pa.concat_tables(gather_tables(ds)).sort_by(
        [("doc_id", "ascending")])
    ranks = {(le, r): i for i, (le, r) in enumerate(
        zip(merges["left"].to_pylist(), merges["right"].to_pylist()))}
    wl = pl.Series(full["text"].to_pylist()).fill_null("") \
        .str.extract_all(TOKEN_RE).to_list()
    assert got["doc_id"].to_pylist() == full["doc_id"].to_pylist()
    assert got["n_words"].to_pylist() == [len(w) for w in wl]
    assert got["n_bpe_tokens"].to_pylist() == [
        sum(len(bpe_encode(w, ranks)) for w in ws) for ws in wl]

    # nulls/empties count zero; the actor cache stays coherent when one
    # batch repeats words another batch introduced
    enc = BpeEncoder(merges)
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["newest widest", None, ""],
                                   pa.string())})
    r1 = enc(t)
    r2 = enc(t)  # second call: all words served from the cache
    assert r1.equals(r2)
    assert r1["n_bpe_tokens"].to_pylist()[1:] == [0, 0]


def test_running_total_matches_pandas(ray_session):
    import duckdb

    from yaschva_ray.pipelines.ops import q_running_total_user

    out = q_running_total_user(SF_DIR).to_pandas()
    con = duckdb.connect()
    df = con.execute(
        f"SELECT event_id, user_id, ts, CAST(round(value*100) AS BIGINT) "
        f"AS cents FROM read_parquet('{SF_DIR}/events.parquet')").fetchdf()
    s = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    want = s.groupby("user_id")["cents"].cumsum().to_numpy()
    assert np.array_equal(out["running_cents"].to_numpy(), want)
    assert np.array_equal(out["event_id"].to_numpy(),
                          s["event_id"].to_numpy())
    # seq restarts at 1 per user
    assert (out.groupby("user_id")["event_seq"].min() == 1).all()


def test_validate_quarantine_routes_exactly(ray_session):
    """clean/ ∪ quarantine/ is a PARTITION of the source: every
    (orderkey, linenumber) appears exactly once, on the side the validity
    predicate assigns it; a second call reuses the written sink."""
    import glob

    import duckdb
    import pyarrow.parquet as _pq

    from yaschva_ray.pipelines.ops import q_validate_quarantine

    first = q_validate_quarantine(SF_DIR).to_pandas()
    import hashlib
    import os as _os

    tag = hashlib.md5(_os.path.realpath(SF_DIR).encode()).hexdigest()[:10]
    bd = f"/tmp/yaschva_quarantine/{tag}/"
    assert glob.glob(bd + "clean/*.parquet"), "sink directory missing"

    def keys(side):
        # MULTISET of keys: (orderkey, linenumber) is not unique in the
        # synthetic data, and two rows sharing it can differ in the
        # checked columns — one clean, one quarantined — legitimately
        t = _pq.read_table(glob.glob(f"{bd}{side}/*.parquet"))
        return sorted(zip(t["l_orderkey"].to_pylist(),
                          t["l_linenumber"].to_pylist()))

    clean, quar = keys("clean"), keys("quarantine")
    con = duckdb.connect()
    want_bad = sorted(map(tuple, con.execute(
        f"SELECT l_orderkey, l_linenumber "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') "
        f"WHERE NOT (l_quantity >= 1 AND l_quantity <= 25 AND "
        f"l_discount >= 0 AND l_discount <= 0.05 AND "
        f"l_returnflag IN ('A','N'))").fetchall()))
    assert quar == want_bad
    total = _pq.read_table(f"{SF_DIR}/lineitem.parquet").num_rows
    assert len(clean) + len(quar) == total
    # idempotent: the second call reads the existing sink, same summary
    again = q_validate_quarantine(SF_DIR).to_pandas()
    assert again.equals(first)


def test_user_event_gaps_matches_pandas(ray_session):
    """Per-user LAG: first row per user is NULL; the rest equal a pandas
    groupby-shift diff in exact integer microseconds / cents."""
    import duckdb

    from yaschva_ray.pipelines.ops import q_user_event_gaps

    out = q_user_event_gaps(SF_DIR).to_pandas()
    con = duckdb.connect()
    df = con.execute(
        f"SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
        f"CAST(round(value*100) AS BIGINT) AS cents "
        f"FROM read_parquet('{SF_DIR}/events.parquet')").fetchdf()
    s = df.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
    want_gap = s.groupby("user_id")["ts_us"].diff()
    want_delta = s.groupby("user_id")["cents"].diff()
    got = out.set_index("event_id")
    assert np.array_equal(got.loc[s["event_id"], "gap_us"].to_numpy(),
                          want_gap.to_numpy(), equal_nan=True)
    assert np.array_equal(got.loc[s["event_id"], "delta_cents"].to_numpy(),
                          want_delta.to_numpy(), equal_nan=True)
    # exactly one NULL gap per user (the first event)
    assert out["gap_us"].isna().groupby(out["user_id"]).sum().eq(1).all()


def test_events_pivot_row_conservation(ray_session):
    from yaschva_ray.pipelines.ops import q_events_pivot

    out = q_events_pivot(SF_DIR).to_pandas()
    import pyarrow.parquet as _pq

    total = _pq.read_table(f"{SF_DIR}/events.parquet").num_rows
    wide_cols = [c for c in out.columns if c.startswith("n_")]
    assert int(out[wide_cols].to_numpy().sum()) == total
    assert out["hour"].is_monotonic_increasing


def test_left_join_preserves_dangling_lineitems(ray_session):
    """Every lineitem row survives the left join; dangling partkeys carry
    nulls and match the anti-join query's dangling set."""
    import pyarrow.parquet as _pq

    from yaschva_ray.pipelines.ops import (
        q_dangling_lineitem_parts,
        q_lineitem_part_left_join,
    )

    out = q_lineitem_part_left_join(SF_DIR)
    n_lineitem = _pq.read_table(f"{SF_DIR}/lineitem.parquet").num_rows
    assert out.num_rows == n_lineitem
    import pyarrow.compute as _pc

    null_keys = set(out.filter(_pc.is_null(out["p_name"]))
                    ["l_partkey"].to_pylist())
    dangling = set(q_dangling_lineitem_parts(SF_DIR)["l_partkey"].to_pylist())
    assert null_keys == dangling


def test_approx_top_tokens_guarantee(ray_session):
    """Misra-Gries heavy hitters: every token whose true count exceeds the
    budget is present, every estimate brackets the truth, and the top
    tokens match the exact vocabulary's top."""
    from yaschva_ray.pipelines.textops import (
        q_approx_top_tokens,
        q_vocab_top_tokens,
    )

    approx = q_approx_top_tokens(SF_DIR, k=64)
    budget = int(approx["budget"][0].as_py()) if approx.num_rows else 0
    est = dict(zip(approx["value"].to_pylist(), approx["n"].to_pylist()))
    exact = q_vocab_top_tokens(SF_DIR)  # full exact top-100
    true = dict(zip(exact["token"].to_pylist(), exact["n"].to_pylist()))
    for tok, tc in true.items():
        if tc > budget:
            assert tok in est, (tok, tc, budget)
        if tok in est:
            assert est[tok] <= tc <= est[tok] + budget
    # the exact top token is the approx top token
    assert approx["value"][0].as_py() == exact["token"][0].as_py()
    # deterministic
    again = q_approx_top_tokens(SF_DIR, k=64)
    assert again.equals(approx)


def test_tdigest_quantiles_accurate(ray_session):
    """The distributed t-digest's quantiles land within 1% (relative) of
    the exact counting quantiles, with bounded centroid count."""
    from yaschva_ray.pipelines.ops import (
        q_events_value_quantiles,
        q_tdigest_quantiles_events,
    )

    td = q_tdigest_quantiles_events(SF_DIR)
    exact = q_events_value_quantiles(SF_DIR)
    for p, col in (("p50", "p50_cents"), ("p90", "p90_cents"),
                   ("p99", "p99_cents")):
        approx = td[p][0].as_py() * 100
        truth = exact[col][0].as_py()
        assert abs(approx - truth) / max(truth, 1) < 0.01, (p, approx, truth)
    assert td["n_centroids"][0].as_py() < 600


def test_events_setops_null_and_multiplicity_semantics(ray_session, tmp_path):
    """Multiset semantics pinned on a hand-built table: INTERSECT ALL =
    min of per-side duplicate counts, EXCEPT ALL = clipped difference,
    and NULL keys (user or type) group as EQUAL values — the set-op
    contract joins don't have."""
    from yaschva_ray.pipelines.ops import q_events_setops

    # side = event_id % 2.  Planted groups:
    #   (1,'a'): 3 on side0, 1 on side1 -> intersect 1, except 2
    #   (NULL,'x'): 2 each side         -> intersect 2, no except
    #   (2,NULL): 1 on side0 only       -> except 1
    #   (3,'b'): 2 on side1 only        -> nothing (a EXCEPT b)
    rows = [(0, 1, "a"), (2, 1, "a"), (4, 1, "a"), (1, 1, "a"),
            (6, None, "x"), (8, None, "x"), (3, None, "x"), (5, None, "x"),
            (10, 2, None), (7, 3, "b"), (9, 3, "b")]
    t = pa.table({"event_id": pa.array([r[0] for r in rows], pa.int64()),
                  "user_id": pa.array([r[1] for r in rows], pa.int64()),
                  "event_type": pa.array([r[2] for r in rows], pa.string())})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))

    out = q_events_setops(str(tmp_path))
    got = {(r["op"], r["user_id"], r["event_type"]): r["n"]
           for r in out.to_pylist()}
    assert got == {("intersect_all", 1, "a"): 1,
                   ("intersect_all", None, "x"): 2,
                   ("except_all", 1, "a"): 2,
                   ("except_all", 2, None): 1}


def test_pagerank_matches_bruteforce_reference(ray_session, tmp_path):
    """The distributed integer-fixed-point PageRank equals a sequential
    numpy reference running the identical update on the identical
    derived graph — node-for-node, bit-for-bit."""
    from yaschva_ray.pipelines.ops import (
        _PR_MULT,
        _PR_OUT,
        _PR_R0,
        _PR_SALT,
        q_pagerank_documents,
    )

    n = 50
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(["x"] * n)})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))

    ranks = np.full(n, _PR_R0, np.int64)
    for _ in range(5):
        nxt = np.zeros(n, np.int64)
        for src in range(n):
            c = ranks[src] // _PR_OUT
            for j in range(_PR_OUT):
                dst = int(((src * _PR_OUT + j) * _PR_MULT + _PR_SALT)
                          % (1 << 32) % n)
                nxt[dst] += c
        ranks = (_PR_R0 * 15) // 100 + (85 * nxt) // 100
    out = q_pagerank_documents(str(tmp_path))
    assert out.num_rows == n  # zero self-rows keep every node alive
    assert out["rank_fp"].to_pylist() == ranks.tolist()


def test_table_checksum_order_and_partition_independent(ray_session, tmp_path):
    """The digest is a pure function of the row MULTISET: permuting row
    order leaves it unchanged; editing one row changes it."""
    from yaschva_ray.pipelines.ops import q_table_checksum_documents

    texts = [f"doc number {i} body" for i in range(200)]
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    ids = list(range(200))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, str(a / "documents.parquet"), row_group_size=37)
    perm = list(reversed(range(200)))
    pq.write_table(t.take(pa.array(perm)), str(b / "documents.parquet"),
                   row_group_size=61)
    ca = q_table_checksum_documents(str(a))
    cb = q_table_checksum_documents(str(b))
    assert ca.equals(cb)

    texts[77] = "tampered"
    c = tmp_path / "c"
    c.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts)}),
                   str(c / "documents.parquet"))
    cc = q_table_checksum_documents(str(c))
    assert cc["n_rows"].equals(ca["n_rows"])
    assert not cc["sum_lo63"].equals(ca["sum_lo63"])
    assert not cc["xor_lo63"].equals(ca["xor_lo63"])


def test_mad_matches_numpy_convention(ray_session, tmp_path):
    """MAD on a hand-built table equals the repo's pinned quantile
    convention (value at rank floor(0.5*(n-1))) applied twice."""
    from yaschva_ray.pipelines.ops import q_mad_lineitem

    vals = [1.00, 2.00, 4.00, 10.00, 100.00]  # cents 100..10000
    t = pa.table({"l_extendedprice": pa.array(vals, pa.float64())})
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    out = q_mad_lineitem(str(tmp_path))
    cents = sorted(int(round(v * 100)) for v in vals)
    med = cents[(len(cents) - 1) // 2]
    devs = sorted(abs(c - med) for c in cents)
    assert out["median_cents"][0].as_py() == med == 400
    assert out["mad_cents"][0].as_py() == devs[(len(devs) - 1) // 2] == 300


def test_unpivot_conserves_rows_per_measure(ray_session, tmp_path):
    from yaschva_ray.pipelines.ops import q_lineitem_unpivot

    t = pa.table({"l_orderkey": pa.array([1, 1, 2], pa.int64()),
                  "l_linenumber": pa.array([1, 1, 1], pa.int32()),
                  "l_quantity": pa.array([5.0, 7.0, None]),
                  "l_extendedprice": pa.array([1.5, 2.5, 3.5]),
                  "l_discount": pa.array([0.05, 0.1, 0.0]),
                  "l_tax": pa.array([0.01, 0.02, 0.03])})
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    out = q_lineitem_unpivot(str(tmp_path))
    assert out.num_rows == 12
    import collections
    cnt = collections.Counter(out["measure"].to_pylist())
    assert set(cnt.values()) == {3}
    # duplicate (orderkey, linenumber) rows order by value within the key
    q = out.filter(pc.and_(pc.equal(out["measure"], "quantity"),
                           pc.equal(out["l_orderkey"], 1)))
    assert q["value_cents"].to_pylist() == [500, 700]


def test_triangle_count_matches_bruteforce(ray_session, tmp_path):
    """Distributed count equals an adjacency-set brute force on the same
    derived graph (n=60 keeps the brute force instant)."""
    from yaschva_ray.pipelines.ops import (
        _PR_MULT,
        _PR_OUT,
        _PR_SALT,
        q_triangle_count,
    )

    n = 60
    pq.write_table(pa.table({"doc_id": pa.array(range(n), pa.int64()),
                             "text": pa.array(["x"] * n)}),
                   os.path.join(tmp_path, "documents.parquet"))
    adj = {i: set() for i in range(n)}
    for s in range(n):
        for j in range(_PR_OUT):
            d = int(((s * _PR_OUT + j) * _PR_MULT + _PR_SALT)
                    % (1 << 32) % n)
            if d != s:
                adj[min(s, d)].add(max(s, d))
    want = sum(1 for a in range(n) for b in sorted(adj[a])
               for c in sorted(adj[a]) if b < c and c in adj.get(b, ()))
    got = q_triangle_count(str(tmp_path))["n_triangles"][0].as_py()
    assert got == want and want > 0


def test_compression_ratio_signal(ray_session, tmp_path):
    """Deterministic across runs; repetitive text compresses well below
    high-entropy text; null/empty docs get 0 bytes."""
    from yaschva_ray.pipelines.textops import q_compression_ratio

    import random
    rnd = random.Random(3)
    texts = ["spam " * 200,                        # highly repetitive
             "".join(chr(rnd.randrange(33, 1000)) for _ in range(1000)),
             "", None]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = q_compression_ratio(str(tmp_path))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[0]["n_zlib_bytes"] * 20 < rows[0]["n_bytes"]  # compresses hard
    assert rows[1]["n_zlib_bytes"] * 2 > rows[1]["n_bytes"]   # barely
    assert rows[2]["n_bytes"] == 0 and rows[3]["n_bytes"] == 0
    assert out.equals(q_compression_ratio(str(tmp_path)))     # deterministic
