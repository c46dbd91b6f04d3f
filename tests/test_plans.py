"""Job-spec gates: validation (the reference sanity_check analog,
/root/reference/utils/utils.py:74-132) and end-to-end spec execution with
resume semantics."""

import os

import pytest

from video_features_spark.plans import FeatureJobSpec, build, run


def test_validate_rejects_bad_specs(tmp_path):
    good = dict(
        images_path=str(tmp_path / "i"), labels_path=str(tmp_path / "l"),
        output_path=str(tmp_path / "o"),
    )
    FeatureJobSpec(**good).validate()
    with pytest.raises(ValueError, match="unknown model"):
        FeatureJobSpec(**good, model="nope").validate()
    with pytest.raises(ValueError, match="num_parts"):
        FeatureJobSpec(**good, num_parts=0).validate()
    with pytest.raises(ValueError, match="salt_threshold"):
        FeatureJobSpec(**good, salt_threshold=0).validate()
    with pytest.raises(ValueError, match="output_path"):
        FeatureJobSpec(
            images_path=str(tmp_path), labels_path=str(tmp_path / "l"),
            output_path=str(tmp_path),
        ).validate()


def test_build_checks_schema(spark, tmp_path):
    p = str(tmp_path / "imgs")
    spark.range(3).write.parquet(p)  # wrong schema on purpose
    spec = FeatureJobSpec(images_path=p, labels_path=p, output_path=str(tmp_path / "o"))
    with pytest.raises(ValueError, match="images table missing"):
        build(spark, spec)


def test_run_end_to_end_and_resume(spark, tmp_path):
    from video_features_spark.sources.datagen import generate_images, generate_labels

    ip, lp, op = (str(tmp_path / d) for d in ("imgs", "lbls", "out"))
    generate_images(spark, 120, n_entities=6).write.parquet(ip)
    generate_labels(spark, 60, n_entities=6).write.parquet(lp)
    spec = FeatureJobSpec(
        images_path=ip, labels_path=lp, output_path=op, num_parts=8
    )
    stats = run(spark, spec)
    assert stats["parts_written"] >= 1 and stats["rows_written"] == 60
    # second run resumes: everything already checkpointed, nothing recomputed
    stats2 = run(spark, spec)
    assert stats2["parts_skipped"] == stats["parts_written"]
    assert stats2["rows_written"] == 0
    assert os.path.isdir(os.path.join(op, "_manifest"))
