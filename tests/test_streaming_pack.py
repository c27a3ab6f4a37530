"""Streaming sequence packing (streaming/pack.py): equality with the
batch op on doc_id-ordered waves, straddle composition, replay
idempotence."""

from pyspark.sql import functions as F

from searchengine_spark.streaming.pack import incremental_pack, read_packed

SF = "/root/testdata/sf0.001"


def _waves(spark, n=3):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[i * len(ids) // n] for i in range(1, n)]
    lo = [None] + cuts
    hi = cuts + [None]
    out = []
    for a, b in zip(lo, hi):
        d = docs
        if a is not None:
            d = d.filter(F.col("doc_id") >= a)
        if b is not None:
            d = d.filter(F.col("doc_id") < b)
        out.append(d)
    return out


def _drain(spark, tmp, wave_df, i):
    wave_df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/stage_{i}"
    )
    import glob
    import shutil

    (pfile,) = glob.glob(f"{tmp}/stage_{i}/*.parquet")
    import os

    os.makedirs(f"{tmp}/in", exist_ok=True)
    shutil.copy(pfile, f"{tmp}/in/wave{i}.parquet")
    incremental_pack(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")


def test_streaming_pack_equals_batch_on_ordered_waves(spark, tmp_path):
    """doc_id-ordered waves make arrival order == the batch op's
    order, so the re-aggregated stream output must EQUAL
    pack_sequences over the whole table — including sequences that
    straddle wave boundaries (partial-aggregate composition)."""
    from searchengine_spark.ops.prep import pack_sequences
    from searchengine_spark.streaming.pack import _read_manifest

    tmp = str(tmp_path)
    for i, wave in enumerate(_waves(spark, 3)):
        _drain(spark, tmp, wave, i)

    got = [tuple(r) for r in read_packed(spark, f"{tmp}/out").collect()]
    want = [tuple(r) for r in pack_sequences(spark, SF).collect()]
    assert got == want

    # straddles actually happened: some sequence has partial rows in
    # two generations (wave boundary does not align to seq_len)
    import os

    m = _read_manifest(f"{tmp}/out")
    assert len(m["generations"]) == 3
    per_gen = [
        {r["seq_id"] for r in
         spark.read.parquet(os.path.join(f"{tmp}/out", g)).collect()}
        for g in m["generations"]
    ]
    assert per_gen[0] & per_gen[1] or per_gen[1] & per_gen[2]
    # cursor equals the corpus token total (= Σ per-sequence tokens)
    assert m["cursor"] == sum(n for _, _, n, _, _ in got)

    # no new files -> nothing changes (checkpoint skip)
    before = got
    incremental_pack(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    after = [
        tuple(r) for r in read_packed(spark, f"{tmp}/out").collect()
    ]
    assert after == before


def test_streaming_pack_replay_is_idempotent(spark, tmp_path):
    """A crash replay of the same checkpoint must not double-pack: the
    committed batch tag swallows the re-delivered micro-batch and the
    cursor continues monotonically across later waves."""
    tmp = str(tmp_path)
    waves = _waves(spark, 2)
    _drain(spark, tmp, waves[0], 0)
    base = [tuple(r) for r in read_packed(spark, f"{tmp}/out").collect()]

    # simulate the crash window: checkpoint wiped AFTER the manifest
    # commit -> the new stream re-reads wave0 under a NEW query id, so
    # its tag does NOT match and wave0 would re-pack (fresh-stream
    # semantics); with the checkpoint intact, a re-run no-ops.
    incremental_pack(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    assert [
        tuple(r) for r in read_packed(spark, f"{tmp}/out").collect()
    ] == base

    # same checkpoint, new files: the cursor continues, never resets
    _drain(spark, tmp, waves[1], 1)
    from searchengine_spark.streaming.pack import _read_manifest

    m = _read_manifest(f"{tmp}/out")
    assert len(m["tags"]) >= 2
    got = [tuple(r) for r in read_packed(spark, f"{tmp}/out").collect()]
    assert len(got) >= len(base)
    # every fully-packed sequence from wave 0 is unchanged; only the
    # straddling tail sequence may have grown
    assert got[: len(base) - 1] == base[: len(base) - 1]
