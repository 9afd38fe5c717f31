"""End-to-end corpus curation: extract → quality-filter → dedup → pack.

The composed production pipeline a training-data user actually runs —
every stage is one of this repo's operators, chained with STAGE-LEVEL
parquet checkpoints:

  stage 1  extract+filter  per-shard resume (run_extraction's manifest)
           then a map-only quality pass over the extracted text
  stage 2  exact dedup     global groupby over text hashes (cross-shard,
           so it restarts whole — its input is the stage-1 checkpoint,
           never the raw corpus). Stage 1 persists (row_key, text_hash)
           columns so the winner pass is a column-pruned slim read and
           neither pass re-hashes text.
  stage 3  window packing  per-conversation token-budget windows

Stage boundaries materialize to ``<out_root>/<stage>/`` with a done
marker; a restarted job skips completed stages. Within stage 1, resume
is per-shard (the finer grain matters there: it is ~all the compute).
This is the honest 100 TB shape — iterating dedup cheaply requires the
extracted text to already sit in columnar form.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

DONE = "_STAGE_DONE.json"


def _stage_done(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, DONE))


def _mark_done(stage_dir: str, info: dict) -> None:
    tmp = os.path.join(stage_dir, DONE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, os.path.join(stage_dir, DONE))


def _fresh_dir(stage_dir: str) -> None:
    """Clear a stage dir before (re)writing it: a run that died between
    write_parquet and _mark_done leaves partial files, and write_parquet
    APPENDS uniquely-named files — recomputing next to the leftovers
    would duplicate every surviving row downstream (same hazard
    run_extraction handles for its per-shard dirs)."""
    import shutil

    if os.path.isdir(stage_dir):
        shutil.rmtree(stage_dir)
    os.makedirs(stage_dir, exist_ok=True)


def _append_row_key(batch: pa.Table) -> pa.Table:
    """The per-turn dedup id shared by stage 1 (key persistence) and
    stage 2's legacy-checkpoint fallback — ONE definition, because the
    winner rule is min(row_key): two divergent formats would silently
    pick different dedup winners on a resumed legacy job."""
    key = pc.binary_join_element_wise(
        batch.column("conv_id"),
        pc.utf8_lpad(pc.cast(batch.column("turn_idx"),
                             pa.string()), 12, "0"), "#")
    return batch.append_column("row_key", key)


def curate_corpus(input_path: str, out_root: str, *,
                  min_words: int = 3, batch_size: int = 64,
                  window_budget: int = 128, concurrency=None,
                  eval_path: str | None = None, decontam_ngram: int = 8,
                  resume: bool = True) -> dict:
    """Run (or resume) the full curation pipeline over a transcript
    parquet path. Returns per-stage summary metrics.

    ``eval_path`` (optional): parquet of held-out benchmark docs with a
    ``text`` column; when given, an extra decontamination stage drops
    every turn sharing an exact ``decontam_ngram``-gram with the eval
    set (between dedup and packing, checkpointed like the others).
    """
    import ray.data

    from ..functions.text import quality_filter_batch
    from .conversations import pack_context_windows
    from .extract import run_extraction

    summary: dict = {"stages": {}}

    # -- stage 1: extraction (per-shard resume) + quality columns ---------
    ex_dir = os.path.join(out_root, "extracted")
    qf_dir = os.path.join(out_root, "filtered")
    t0 = time.perf_counter()
    ex = run_extraction(input_path, ex_dir, keep_spans=False,
                        batch_size=batch_size, concurrency=concurrency,
                        resume=resume)
    ex["sec"] = round(time.perf_counter() - t0, 3)
    summary["stages"]["extract"] = ex

    t0 = time.perf_counter()
    if not (resume and _stage_done(qf_dir)):
        ds = ray.data.read_parquet(ex_dir)
        ds = ds.map_batches(quality_filter_batch,
                            fn_kwargs=dict(text_col="extracted_text",
                                           min_words=min_words),
                            batch_format="pyarrow")
        def keep_only(batch: pa.Table) -> pa.Table:
            m = batch.column("keep")
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            kept = batch.filter(m)
            # persist the dedup keys NOW, while the text is already in
            # this task's heap: stage 2's winner pass then needs only a
            # column-pruned (row_key, text_hash) read — ~2% of the
            # checkpoint bytes — instead of decoding and re-hashing the
            # full text twice
            from .dedup import add_md5

            return add_md5(_append_row_key(kept), "extracted_text")

        kept = ds.map_batches(keep_only, batch_format="pyarrow")
        _fresh_dir(qf_dir)
        kept.write_parquet(qf_dir)
        n_kept = ray.data.read_parquet(qf_dir).count()
        _mark_done(qf_dir, {"rows_kept": n_kept})
    with open(os.path.join(qf_dir, DONE)) as f:
        summary["stages"]["quality_filter"] = {
            **json.load(f), "sec": round(time.perf_counter() - t0, 3)}

    # -- stage 2: exact dedup on extracted text (global) -------------------
    dd_dir = os.path.join(out_root, "deduped")
    t0 = time.perf_counter()
    if not (resume and _stage_done(dd_dir)):
        from .dedup import exact_dedup

        ds = ray.data.read_parquet(qf_dir)
        ckpt_cols = set(ds.schema().names)
        if {"row_key", "text_hash"} <= ckpt_cols:
            # winner pass reads ONLY the two key columns (pruned at
            # the parquet read); the full-schema read streams once, in
            # the map-only survivor filter — no text hashing anywhere
            slim = ray.data.read_parquet(
                qf_dir, columns=["row_key", "text_hash"])
            survivors = exact_dedup(ds, id_col="row_key",
                                    text_col="extracted_text",
                                    hash_col="text_hash",
                                    winner_input=slim)
        else:
            # forward-compat: a stage-1 checkpoint written before the
            # keys were persisted — fall back to the self-hashing path
            # so a resumed job completes instead of crashing. Drop any
            # PARTIAL key column first (a checkpoint with exactly one
            # of the two would otherwise gain a duplicate column and
            # crash the select inside exact_dedup).
            partial = [c for c in ("row_key", "text_hash")
                       if c in ckpt_cols]
            if partial:
                ds = ds.drop_columns(partial)
            keyed = ds.map_batches(_append_row_key,
                                   batch_format="pyarrow")
            survivors = exact_dedup(keyed, id_col="row_key",
                                    text_col="extracted_text")
        _fresh_dir(dd_dir)
        survivors.drop_columns(["row_key", "text_hash"]) \
            .write_parquet(dd_dir, min_rows_per_file=16384)
        _mark_done(dd_dir, {
            "rows_out": ray.data.read_parquet(dd_dir).count()})
    with open(os.path.join(dd_dir, DONE)) as f:
        summary["stages"]["dedup"] = {
            **json.load(f), "sec": round(time.perf_counter() - t0, 3)}

    # -- stage 2.5: benchmark decontamination (optional) --------------------
    pack_src = dd_dir
    if eval_path is not None:
        dc_dir = os.path.join(out_root, "decontaminated")
        t0 = time.perf_counter()
        if not (resume and _stage_done(dc_dir)):
            from .contamination import decontaminate

            clean = decontaminate(ray.data.read_parquet(dd_dir),
                                  ray.data.read_parquet(eval_path),
                                  text_col="extracted_text",
                                  eval_text_col="text",
                                  ngram=decontam_ngram)
            _fresh_dir(dc_dir)
            clean.write_parquet(dc_dir, min_rows_per_file=16384)
            _mark_done(dc_dir, {
                "rows_out": ray.data.read_parquet(dc_dir).count()})
        with open(os.path.join(dc_dir, DONE)) as f:
            summary["stages"]["decontaminate"] = {
                **json.load(f), "sec": round(time.perf_counter() - t0, 3)}
        pack_src = dc_dir

    # -- stage 3: context-window packing ----------------------------------
    pk_dir = os.path.join(out_root, "packed")
    t0 = time.perf_counter()
    if not (resume and _stage_done(pk_dir)):
        # prune at the read: packing needs only the window key columns
        # + text for token counts — decoding the full checkpoint schema
        # (metrics, title, shard) was 4x the stage's wall time
        ds = ray.data.read_parquet(
            pack_src, columns=["conv_id", "turn_idx", "extracted_text"])
        packed = pack_context_windows(ds, budget=window_budget,
                                      text_col="extracted_text")
        _fresh_dir(pk_dir)
        packed.write_parquet(pk_dir, min_rows_per_file=16384)
        _mark_done(pk_dir, {
            "rows_out": ray.data.read_parquet(pk_dir).count()})
    with open(os.path.join(pk_dir, DONE)) as f:
        summary["stages"]["pack"] = {
            **json.load(f), "sec": round(time.perf_counter() - t0, 3)}

    return summary
