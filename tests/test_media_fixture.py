"""The materialized binary media fixture (sources/media_fixture.py).

Pins the r10 verdict task-2 contract: the dedup operators' blob read
path (parquet binary column → Arrow batch → production decode) yields
EXACTLY the hash relations the in-kernel synthesis path yields — the
payload source changed, the bytes did not — and materialization is
idempotent (second call reuses the table, no rewrite).
"""

from __future__ import annotations

import os

from star_schema_etl_airflow_spark.plans.audio_dedup import fingerprint_of
from star_schema_etl_airflow_spark.plans.image_dedup import dhash_of
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.sources.media_fixture import (
    load_media,
    materialize_media,
)

SF_DIR = "/root/testdata/sf0.001"


def test_media_table_schema_and_cardinality(spark):
    media = load_media(spark, SF_DIR)
    assert [f.name for f in media.schema.fields] == ["doc_id", "png", "wav"]
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint", "binary", "binary"]
    docs = load_table(spark, SF_DIR, "documents")
    assert media.count() == docs.count()
    # blobs are real containers: PNG magic + RIFF/WAVE magic
    row = media.orderBy("doc_id").first()
    assert bytes(row["png"])[:8] == b"\x89PNG\r\n\x1a\n"
    assert bytes(row["wav"])[:4] == b"RIFF"
    assert bytes(row["wav"])[8:12] == b"WAVE"


def test_blob_path_equals_synthesis_path(spark):
    """Same doc_ids, two payload sources — identical hash relations.
    This is what makes swapping the registered queries onto the blob
    path a pure read-path change, with the closed-form oracles valid
    unchanged."""
    media = load_media(spark, SF_DIR)
    ids = media.select("doc_id")

    img_blob = sorted(
        tuple(r) for r in dhash_of(media.select("doc_id", "png")).collect())
    img_synth = sorted(tuple(r) for r in dhash_of(ids).collect())
    assert img_blob == img_synth

    aud_blob = sorted(
        tuple(r)
        for r in fingerprint_of(media.select("doc_id", "wav")).collect())
    aud_synth = sorted(tuple(r) for r in fingerprint_of(ids).collect())
    assert aud_blob == aud_synth


def test_materialization_is_idempotent(spark):
    path = materialize_media(spark, SF_DIR)
    assert os.path.isdir(path)
    mtime = os.path.getmtime(path)
    again = materialize_media(spark, SF_DIR)
    assert again == path
    assert os.path.getmtime(path) == mtime, "second call rewrote the table"


def test_cache_key_binds_to_source_not_basename(tmp_path, spark):
    """r11 ADVICE (medium): two fixture dirs sharing a basename must not
    collide, and regenerating documents.parquet in place must produce a
    fresh cache key (the stale derived table is never addressed)."""
    import shutil

    from star_schema_etl_airflow_spark.sources.media_fixture import (
        media_path,
    )

    a = tmp_path / "a" / "sfX"
    b = tmp_path / "b" / "sfX"
    for d in (a, b):
        d.mkdir(parents=True)
        shutil.copy(
            os.path.join(SF_DIR, "documents.parquet"),
            d / "documents.parquet")
    pa, pb = media_path(str(a)), media_path(str(b))
    assert pa != pb, "same-basename fixtures collided in the media cache"

    # regenerate in place: bump mtime -> new key
    os.utime(a / "documents.parquet")
    assert media_path(str(a)) != pa, "in-place regeneration reused stale key"


def test_load_media_rebuilds_on_cardinality_mismatch(tmp_path, spark):
    """A cache entry whose row count disagrees with the live documents
    table (e.g. an interrupted writer) is torn down and rebuilt."""
    path = materialize_media(spark, SF_DIR)
    n = spark.read.parquet(path).count()
    # corrupt: replace with a 1-row table at the same path
    import shutil

    one = spark.read.parquet(path).limit(1)
    tmp = str(tmp_path / "one")
    one.write.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    assert spark.read.parquet(path).count() == 1
    media = load_media(spark, SF_DIR)
    assert media.count() == n, "load_media served the corrupted cache"
