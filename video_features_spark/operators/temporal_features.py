"""Temporal feature operators over per-entity image/embedding sequences:
consecutive-pair features (the optical-flow pattern), stack mean-pooling (the
S3D/I3D clip-embedding pattern), and zero-shot classification (the CLIP
image×text pattern).

These are the three reference operator families that consume *sequences*, not
single rows — re-expressed so the windowing lives in DataFrame land (the
reference hand-rolls it inside its batcher and needs an overlap cache,
``/root/reference/utils/io.py:120-126``, to avoid losing pairs at batch
boundaries; ``F.lead`` makes that problem not exist).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.codec import decode_image
from ..functions.embed import get_model


def _pair_metrics(a: np.ndarray, nxt: np.ndarray) -> tuple[float, float]:
    if a.shape != nxt.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {nxt.shape}")
    diff = np.abs(a.astype(np.int16) - nxt.astype(np.int16))
    return float(diff.mean()), float((diff.max(axis=2) > 8).mean())


def consecutive_pair_features(
    df: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    strategy: str = "window",
    partitions: int | None = None,
) -> DataFrame:
    """Pair every image with its entity's NEXT image and compute pair features
    (mean absolute pixel motion, changed-pixel fraction) — the relational form
    of the reference's flow extraction: ``model(batch[:-1], batch[1:])`` with
    an overlap=1 batch cache (``models/_base/base_flow_extractor.py:78-84``,
    ``utils/io.py:120-126``).

    Two strategies, identical output (equivalence-tested):

    ``window``: ``F.lead`` over (entity ORDER BY ts) pairs rows across any
    partitioning; one shuffle, then a single Arrow pass. Simple and correct —
    but every image's BYTES travel twice through the window shuffle (once as
    itself, once as its predecessor's lead), and decode runs twice per image.

    ``partition`` (the 100 TB path): ``repartition(entity)`` +
    ``sortWithinPartitions(entity, ts)`` + ``mapInPandas`` with a one-row
    carry across Arrow batches (entity never straddles a partition, only
    batches). Bytes shuffle ONCE and each image decodes ONCE per batch —
    halves both network volume and decode CPU for ~25 KB payloads.

    Last frame of each entity has no successor → dropped (same as reference:
    T frames yield T-1 flow vectors). Pairs with mismatched shapes (the entity
    changed resolution mid-stream) yield null features + an ``error``.
    """
    if strategy == "partition":
        return _pair_features_partition(df, entity_col, ts_col, bytes_col, fmt_col, partitions)
    if strategy != "window":
        raise ValueError(f"strategy must be window|partition, got {strategy!r}")
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    paired = (
        df.select(entity_col, ts_col, bytes_col, fmt_col)
        .withColumn("__nb", F.lead(bytes_col).over(w))
        .withColumn("__nf", F.lead(fmt_col).over(w))
        .withColumn("__nts", F.lead(ts_col).over(w))
        .filter(F.col("__nb").isNotNull())
    )
    id_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in (entity_col, ts_col)
    )
    out_schema = (
        f"{id_schema}, next_ts timestamp, mean_abs_motion double, "
        f"changed_frac double, error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            motion, changed, err = [], [], []
            for i in range(len(b)):
                try:
                    a = decode_image(bytes(b[bytes_col].iloc[i]), b[fmt_col].iloc[i])
                    nxt = decode_image(bytes(b["__nb"].iloc[i]), b["__nf"].iloc[i])
                    m, c = _pair_metrics(a, nxt)
                    motion.append(m)
                    changed.append(c)
                    err.append(None)
                except Exception as e:  # noqa: BLE001 - quarantine
                    motion.append(None)
                    changed.append(None)
                    err.append(f"{type(e).__name__}: {e}")
            out = b[[entity_col, ts_col]].copy()
            out["next_ts"] = b["__nts"].values
            out["mean_abs_motion"] = motion
            out["changed_frac"] = changed
            out["error"] = err
            yield out

    return paired.mapInPandas(run, schema=out_schema)


def _pair_features_partition(df, entity_col, ts_col, bytes_col, fmt_col, partitions):
    """See consecutive_pair_features(strategy='partition'). The carry row
    bridges Arrow-batch boundaries INSIDE a partition — the Spark-shaped twin
    of the reference's overlap=1 batch cache (utils/io.py:120-126), needed
    here only because mapInPandas slices one partition into many batches."""
    sel = df.select(entity_col, ts_col, bytes_col, fmt_col)
    npart = partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = sel.repartition(npart, entity_col).sortWithinPartitions(entity_col, ts_col)
    id_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in (entity_col, ts_col)
    )
    out_schema = (
        f"{id_schema}, next_ts timestamp, mean_abs_motion double, "
        f"changed_frac double, error string"
    )
    cols = [entity_col, ts_col, "next_ts", "mean_abs_motion", "changed_frac", "error"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for b in batches:
            if carry is not None:
                b = pd.concat([carry, b], ignore_index=True)
            if len(b) < 2:
                carry = b
                continue
            decoded: list = []
            for i in range(len(b)):
                try:
                    decoded.append(decode_image(bytes(b[bytes_col].iloc[i]), b[fmt_col].iloc[i]))
                except Exception as e:  # noqa: BLE001 - quarantine
                    decoded.append(e)
            rows = []
            ents = b[entity_col].values
            for i in range(len(b) - 1):
                if ents[i] != ents[i + 1]:
                    continue
                try:
                    a, nxt = decoded[i], decoded[i + 1]
                    if isinstance(a, Exception):
                        raise a
                    if isinstance(nxt, Exception):
                        raise nxt
                    m, c = _pair_metrics(a, nxt)
                    rows.append((ents[i], b[ts_col].iloc[i], b[ts_col].iloc[i + 1], m, c, None))
                except Exception as e:  # noqa: BLE001
                    rows.append(
                        (ents[i], b[ts_col].iloc[i], b[ts_col].iloc[i + 1],
                         None, None, f"{type(e).__name__}: {e}")
                    )
            carry = b.iloc[[-1]].reset_index(drop=True)
            yield pd.DataFrame(rows, columns=cols)

    return arranged.mapInPandas(run, schema=out_schema)


def consecutive_pair_embeddings(
    df: DataFrame,
    model_name: str = "raft-small-det",
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    precision: str = "fp32",
) -> DataFrame:
    """Pair every image with its entity's next image and run the TWO-INPUT
    model head over each pair — the reference's flow-model architecture
    (``/root/reference/models/raft/raft_src/raft.py:118-177``:
    ``model(img_t, img_t+1)`` in one forward) behind the same embed registry
    as the single-frame encoders. The pairing is the J1 lead window
    ``consecutive_pair_features`` uses; the decode+forward is one Arrow pass.
    Mixed-size pairs are legal (both frames resize through the model's
    preprocess first). Decode failures quarantine per-row (S10 contract).
    Output: (entity, ts, next_ts, embedding array<float>, error string)."""
    from ..functions.embed import preprocess_and_embed_pairs

    w = Window.partitionBy(entity_col).orderBy(ts_col)
    paired = (
        df.select(entity_col, ts_col, bytes_col, fmt_col)
        .withColumn("__nb", F.lead(bytes_col).over(w))
        .withColumn("__nf", F.lead(fmt_col).over(w))
        .withColumn("__nts", F.lead(ts_col).over(w))
        .filter(F.col("__nb").isNotNull())
    )
    id_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in (entity_col, ts_col)
    )
    out_schema = f"{id_schema}, next_ts timestamp, embedding array<float>, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fa, fb, ok, err = [], [], [], []
            for i in range(len(b)):
                try:
                    fa.append(decode_image(bytes(b[bytes_col].iloc[i]), b[fmt_col].iloc[i]))
                    fb.append(decode_image(bytes(b["__nb"].iloc[i]), b["__nf"].iloc[i]))
                    ok.append(i)
                    err.append(None)
                except Exception as e:  # noqa: BLE001 - quarantine
                    if len(fa) > len(fb):
                        fa.pop()
                    err.append(f"{type(e).__name__}: {e}")
            embs: list = [None] * len(b)
            if ok:
                vecs = preprocess_and_embed_pairs(fa, fb, model_name, precision)
                for j, i in enumerate(ok):
                    embs[i] = vecs[j].tolist()
            out = b[[entity_col, ts_col]].copy()
            out["next_ts"] = b["__nts"].values
            out["embedding"] = embs
            out["error"] = err
            yield out

    return paired.mapInPandas(run, schema=out_schema)


def consecutive_pair_flow_fields(
    df: DataFrame,
    grid: int = 8,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Pair every image with its entity's next image and emit a DENSE coarse
    flow field per pair — the reference's RAFT *output* semantics (a 2-channel
    motion grid per consecutive pair, ``raft_src/raft.py:118-177``), where
    ``consecutive_pair_embeddings`` matches only its two-input *architecture*
    shape. The field is ``functions.flow.pair_flow_field`` flattened to
    ``array<float>`` of length ``2*grid*grid`` in (channel, row, col) order.
    Same J1 lead-window pairing; decode failures quarantine per-row (S10)."""
    from ..functions.flow import pair_flow_field

    w = Window.partitionBy(entity_col).orderBy(ts_col)
    paired = (
        df.select(entity_col, ts_col, bytes_col, fmt_col)
        .withColumn("__nb", F.lead(bytes_col).over(w))
        .withColumn("__nf", F.lead(fmt_col).over(w))
        .withColumn("__nts", F.lead(ts_col).over(w))
        .filter(F.col("__nb").isNotNull())
    )
    id_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in (entity_col, ts_col)
    )
    out_schema = f"{id_schema}, next_ts timestamp, flow array<float>, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            flows, err = [], []
            for i in range(len(b)):
                try:
                    a = decode_image(bytes(b[bytes_col].iloc[i]), b[fmt_col].iloc[i])
                    nxt = decode_image(bytes(b["__nb"].iloc[i]), b["__nf"].iloc[i])
                    flows.append(pair_flow_field(a, nxt, grid).ravel().tolist())
                    err.append(None)
                except Exception as e:  # noqa: BLE001 - quarantine
                    flows.append(None)
                    err.append(f"{type(e).__name__}: {e}")
            out = b[[entity_col, ts_col]].copy()
            out["next_ts"] = b["__nts"].values
            out["flow"] = flows
            out["error"] = err
            yield out

    return paired.mapInPandas(run, schema=out_schema)


def stack_mean_pool(
    df: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    emb_col: str = "embedding",
    stack_size: int = 8,
    step_size: int = 4,
    max_group_rows: int = 100_000,
) -> DataFrame:
    """Clip-level embeddings: slide a window of ``stack_size`` frame embeddings
    per entity (advance ``step_size``, complete stacks only) and mean-pool each
    stack into one vector — the S3D semantics (``s3d_src/s3d.py:35-48``: pool
    over the stack then mean; stack framing per ``form_slices``,
    ``utils/utils.py:62-71``; emitted ts = last frame of the stack, matching
    I3D's fire-at-stack-full timestamp, ``extract_i3d.py:115-124``).

    Implementation: per-entity cogroup-free ``applyInPandas`` (one group = one
    entity; embedding stacking is a dense numpy op, the exact case grouped-map
    UDFs exist for). Entities are independent → embarrassingly parallel."""
    out_schema = (
        f"`{entity_col}` {df.schema[entity_col].dataType.simpleString()}, "
        f"stack_start_idx int, stack_ts timestamp, stack_embedding array<float>"
    )

    def pool(pdf: pd.DataFrame) -> pd.DataFrame:
        # one group = one entity's full history in one task; a runaway entity
        # would OOM the executor silently — fail loudly with the culprit instead
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"entity {pdf[entity_col].iloc[0]!r} has {len(pdf)} rows > "
                f"max_group_rows={max_group_rows}; pre-window or raise the cap"
            )
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        rows = []
        embs = np.array(pdf[emb_col].tolist(), dtype=np.float32) if n else None
        for start in range(0, n - stack_size + 1, step_size):
            stack = embs[start : start + stack_size]
            rows.append(
                (
                    pdf[entity_col].iloc[0],
                    start,
                    pdf[ts_col].iloc[start + stack_size - 1],
                    stack.mean(axis=0).astype(np.float32).tolist(),
                )
            )
        return pd.DataFrame(
            rows, columns=[entity_col, "stack_start_idx", "stack_ts", "stack_embedding"]
        )

    return df.select(entity_col, ts_col, emb_col).groupBy(entity_col).applyInPandas(
        pool, schema=out_schema
    )


def zero_shot_classify(
    image_feats: DataFrame,
    class_captions: Sequence[str],
    model_name: str = "clip-small-det",
    id_col: str = "image_id",
    emb_col: str = "embedding",
    logit_scale: float = 100.0,
    top_k: int = 5,
) -> DataFrame:
    """CLIP zero-shot classification: every image embedding against every class
    caption embedding — ``logit_scale * v @ t.T`` then top-k
    (``models/clip/extract_clip.py:86-108``; top-5 print at
    ``utils/utils.py:40-46``). The class table is tiny → computed driver-side
    once, broadcast-joined; per-row softmax over classes in JVM expressions."""
    from ..functions.embed import embed_captions

    spark = image_feats.sparkSession
    cls_emb = embed_captions(list(class_captions), model_name)
    cls_df = spark.createDataFrame(
        [(i, c, e.tolist()) for i, (c, e) in enumerate(zip(class_captions, cls_emb))],
        "class_id int, class_caption string, class_embedding array<float>",
    )
    dot = F.aggregate(
        F.zip_with(emb_col, "class_embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = image_feats.crossJoin(F.broadcast(cls_df)).select(
        id_col, "class_id", "class_caption", (F.lit(logit_scale) * dot).alias("logit")
    )
    # softmax over ALL classes (reference softmaxes the full logit row before
    # ranking, extract_clip.py:100-104) — normalizing after the top-k filter
    # would inflate probs whenever top_k < n_classes. Both windows share the
    # id_col partitioning, so the rank sort rides the same exchange.
    wsum = Window.partitionBy(id_col)
    probs = scored.withColumn(
        "prob", F.exp(F.col("logit") - F.max("logit").over(wsum))
        / F.sum(F.exp(F.col("logit") - F.max("logit").over(wsum))).over(wsum),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("logit"), F.asc("class_id"))
    return probs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= top_k)
