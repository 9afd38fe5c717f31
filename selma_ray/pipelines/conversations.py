"""Per-conversation assembly and stats: the groupby(conv_id) wide ops.

North-rule items: "groupby(conv_id)+sort(turn_idx) shuffles to guarantee
stable per-conversation turn ordering" and "salted-key skew mitigation for
conversations with pathological turn counts".

Skew design: a conversation must ultimately co-locate to be assembled, so
a plain ``groupby(conv_id).map_groups`` ships every TURN row through the
shuffle and lands a pathological conversation's full turn list in one
group task. Instead, assembly is TWO-PHASE:

  phase 1 — within each input block (map_batches, no shuffle), turns are
      pre-combined into one ordered SEGMENT row per (conv_id, block):
      text pieces joined, counts/bytes partially summed. This is the
      "salting" step: the implicit salt is the block id, which bounds any
      group's phase-2 fan-in to #blocks-touching-that-conv, independent
      of its turn count.
  phase 2 — groupby(conv_id).map_groups merges the few segment rows per
      conversation (ordered by their min turn_idx, then per-segment
      order), which is O(segments), not O(turns), per group.

The shuffle still moves the text bytes (unavoidable — assembly needs
them) but row counts, per-group memory, and group-task skew collapse from
"turns of the hottest conversation" to "blocks of the hottest
conversation".
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import coalesce_small

SEG_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("first_turn", pa.int64()),
    ("n_turns", pa.int64()),
    ("n_chars", pa.int64()),
    ("joined", pa.large_string()),
])


def _segments(text_col: str, sep: str):
    def seg(batch: pa.Table) -> pa.Table:
        # sort within the block, then one segment row per conv_id
        b = batch.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        convs = b.column("conv_id").to_pylist()
        turns = b.column("turn_idx").to_pylist()
        texts = b.column(text_col).to_pylist()
        out = {k: [] for k in ("conv_id", "first_turn", "n_turns",
                               "n_chars", "joined")}
        i, n = 0, len(convs)
        while i < n:
            j = i
            while j < n and convs[j] == convs[i]:
                j += 1
            pieces = [t if t is not None else "" for t in texts[i:j]]
            joined = sep.join(pieces)
            out["conv_id"].append(convs[i])
            out["first_turn"].append(int(turns[i]))
            out["n_turns"].append(j - i)
            out["n_chars"].append(sum(len(p) for p in pieces))
            out["joined"].append(joined)
            i = j
        return pa.table({
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "first_turn": pa.array(out["first_turn"], pa.int64()),
            "n_turns": pa.array(out["n_turns"], pa.int64()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
            "joined": pa.array(out["joined"], pa.large_string()),
        })
    return seg


def _merge_segments(sep: str):
    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("first_turn", "ascending")])
        joined = sep.join(t for t in g.column("joined").to_pylist())
        return pa.table({
            "conv_id": g.column("conv_id").slice(0, 1),
            "n_turns": pa.array(
                [int(pc.sum(g.column("n_turns")).as_py())], pa.int64()),
            "n_chars": pa.array(
                [int(pc.sum(g.column("n_chars")).as_py())], pa.int64()),
            "text": pa.array([joined], pa.large_string()),
        })
    return merge


def assemble_conversations(ds, *, text_col: str = "text", sep: str = "\n"):
    """Dataset of turns → one row per conversation, turns joined in
    (turn_idx) order. Two-phase (see module docstring) so pathological
    conversations don't create straggler group tasks.

    NOTE: segments assume turn_idx ranges don't interleave across blocks
    for the same conversation, which holds for any (conv_id, turn_idx)-
    clustered input layout (ours are written that way); for arbitrary
    layouts, pass the dataset through ``ds.sort(["conv_id","turn_idx"])``
    first (one global shuffle) or widen the merge to re-sort turn lists.
    """
    from ..stages.util import per_key_in_buckets

    segs = ds.map_batches(_segments(text_col, sep), batch_format="pyarrow")
    # per-conversation merge at per-BUCKET task cost (the fn keeps its
    # one-conversation contract; conversation count never appears in
    # the task count)
    return per_key_in_buckets(segs, "conv_id", _merge_segments(sep))


def pack_context_windows(ds, *, budget: int = 128, text_col: str = "text"):
    """Assign each turn a per-conversation context-window id under a
    token budget: window_idx = (preceding cumulative token count) //
    budget, with turns taken in (turn_idx) order. Sequential fixed-budget
    packing — the deterministic, shuffle-friendly variant of greedy
    packing used to cut transcripts into training windows.

    Shuffle shape: one hash-bucket exchange of (conv_id, turn_idx,
    n_tokens) triples — the text itself never rides through the
    shuffle; token counts are computed map-side (vectorized RE2)
    before the wide step. The per-conversation cumsum runs VECTORIZED
    across a whole bucket (sort by (conv, turn), segment-reset prefix
    sum) via bucketed_map_groups, replacing one numpy call per
    conversation with one per bucket; together with the pruned
    checkpoint read this took the curate pack stage from 46.6s to
    11.5s at sf0.1, and the bucket count (not the conversation count)
    bounds reducer fan-in at any scale.
    """
    import numpy as np

    from ..stages.util import bucketed_map_groups

    def tokens(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": pc.cast(batch.column("turn_idx"), pa.int64()),
            # null text counts as 0 tokens: a null n_tokens would turn
            # the whole column float64/NaN in pack() and poison every
            # later cumsum in the conversation
            "n_tokens": pc.fill_null(pc.cast(pc.count_substring_regex(
                batch.column(text_col), pattern=r"\S+"), pa.int64()),
                pa.scalar(0, pa.int64())),
        })

    def pack_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl, sort_keys=[("conv_id", "ascending"),
                            ("turn_idx", "ascending")])
        g = tbl.take(order)
        conv = g.column("conv_id").to_numpy(zero_copy_only=False)
        tok = g.column("n_tokens").to_numpy()
        n = len(tok)
        if n == 0:
            return g.append_column("window_idx",
                                   pa.array([], pa.int64()))
        start = np.ones(n, bool)
        start[1:] = conv[1:] != conv[:-1]
        before = np.cumsum(tok) - tok
        # segment-reset: subtract each conversation's first cum-before
        seg_first = np.maximum.accumulate(
            np.where(start, np.arange(n), 0))
        local = before - before[seg_first]
        return g.append_column(
            "window_idx", pa.array(local // budget, pa.int64()))

    slim = ds.map_batches(tokens, batch_format="pyarrow")
    return bucketed_map_groups(slim, "conv_id", pack_bucket)


def conversation_stats(ds):
    """Per-conversation turn counts / byte totals without shipping text:
    partial-aggregate inside blocks (combiner), tiny groupby after."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": pc.cast(batch.column("turn_idx"), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")),
                               pa.int64()),
        })
        g = t.group_by("conv_id").aggregate([
            ("turn_idx", "count"), ("turn_idx", "min"), ("turn_idx", "max"),
            ("n_chars", "sum")])
        return pa.table({
            "conv_id": g.column("conv_id"),
            "pn": pc.cast(g.column("turn_idx_count"), pa.int64()),
            "pmin": pc.cast(g.column("turn_idx_min"), pa.int64()),
            "pmax": pc.cast(g.column("turn_idx_max"), pa.int64()),
            "pchars": pc.cast(g.column("n_chars_sum"), pa.int64()),
        })

    agg = coalesce_small(
        ds.map_batches(partial, batch_format="pyarrow")
    ).groupby("conv_id").aggregate(
        Sum("pn"), Min("pmin"), Max("pmax"), Sum("pchars"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "n_turns": pc.cast(batch.column("sum(pn)"), pa.int64()),
            "first_turn": pc.cast(batch.column("min(pmin)"), pa.int64()),
            "last_turn": pc.cast(batch.column("max(pmax)"), pa.int64()),
            "total_chars": pc.cast(batch.column("sum(pchars)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def packed_sequences(ds, *, budget: int = 128, text_col: str = "text",
                     sep: str = "\n"):
    """Materialize the actual packed training sequences: per
    (conv_id, window_idx), the turn texts concatenated in turn order ->
    (conv_id, window_idx, n_turns, n_tokens, text).

    Unlike pack_context_windows (which ships only token counts), here
    the text itself MUST co-locate — sequence assembly is the one op
    where payload rides the shuffle. Mitigations: one hash-BUCKET
    exchange on conv_id (never a global sort, never a per-conversation
    task), and everything else (token counts, window ids, concat)
    happens inside the bucket task with a segment-reset cumsum across
    every conversation in the bucket. Conversations are the
    partitioning unit, so the skew cap is the largest single
    conversation — the same bound conversation_assembly carries.
    """
    import numpy as np
    import pandas as pd

    from ..stages.util import bucketed_map_groups

    def assemble_bucket(tbl: pa.Table) -> pa.Table:
        g = tbl.to_pandas().sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        texts = g[text_col].fillna("")
        n_tok = np.fromiter((len(t.split()) for t in texts),
                            dtype=np.int64, count=len(texts))
        conv = g["conv_id"].to_numpy()
        n = len(conv)
        first = np.ones(n, bool)
        if n:
            first[1:] = conv[1:] != conv[:-1]
        before = np.cumsum(n_tok) - n_tok
        seg_first = np.maximum.accumulate(
            np.where(first, np.arange(n), 0)) if n else first
        widx = (before - before[seg_first]) // budget if n else before
        g = g.assign(_w=widx, _n=n_tok, _t=texts)
        out = g.groupby(["conv_id", "_w"], sort=False).agg(
            n_turns=("_w", "size"),
            n_tokens=("_n", "sum"),
            text=("_t", sep.join)).reset_index()
        return pa.Table.from_pandas(pd.DataFrame({
            "conv_id": out["conv_id"],
            "window_idx": out["_w"].astype("int64"),
            "n_turns": out["n_turns"].astype("int64"),
            "n_tokens": out["n_tokens"].astype("int64"),
            "text": out["text"],
        }), preserve_index=False)

    return bucketed_map_groups(ds, "conv_id", assemble_bucket)


def turn_pairs(ds, *, user_role: str = "user",
               assistant_role: str = "assistant", text_col: str = "text"):
    """Adjacent-turn instruction-pair mining: for every ``user_role``
    turn immediately followed (in turn_idx order) by an
    ``assistant_role`` turn in the same conversation, emit one
    (prompt, response) row — the SFT-pair extraction op, i.e. a
    LEAD(...) OVER (PARTITION BY conv_id ORDER BY turn_idx) window.

    Shuffle shape: one hash-BUCKET exchange on conv_id (the turn text
    must co-locate per conversation — same skew bound as
    packed_sequences: the largest single conversation; pathological
    conversations should be length-capped upstream). The shift runs
    once per BUCKET, vectorized across every conversation in it, with
    a same-conversation mask guarding the bucket's conversation
    boundaries — one pandas conversion per bucket instead of one per
    conversation.

    Returns (conv_id, prompt_idx:int64, response_idx:int64,
    prompt, response).
    """
    import pandas as pd

    from ..stages.util import bucketed_map_groups

    def pairs_bucket(tbl: pa.Table) -> pa.Table:
        g = tbl.to_pandas().sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        nxt_role = g["role"].shift(-1)
        same_conv = g["conv_id"].shift(-1) == g["conv_id"]
        keep = (g["role"] == user_role) & (nxt_role == assistant_role) \
            & same_conv
        out = pd.DataFrame({
            "conv_id": g.loc[keep, "conv_id"],
            "prompt_idx": g.loc[keep, "turn_idx"].astype("int64"),
            "response_idx": g["turn_idx"].shift(-1)[keep].astype("int64"),
            "prompt": g.loc[keep, text_col],
            "response": g[text_col].shift(-1)[keep],
        })
        if out.empty:
            out = pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "prompt_idx": pd.Series([], dtype="int64"),
                "response_idx": pd.Series([], dtype="int64"),
                "prompt": pd.Series([], dtype="object"),
                "response": pd.Series([], dtype="object"),
            })
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed_map_groups(ds, "conv_id", pairs_bucket)


def _token_bucket_partials(batch: pa.Table, *, id_col: str, text_col: str,
                           bucket_width: int) -> pa.Table:
    """Per-batch combiner for global packing pass 1: partial token sums
    per id-range bucket (bucket = id // bucket_width)."""
    from ..functions.text import token_count_batch

    toks = pc.cast(token_count_batch(batch.column(text_col)),
                   pa.int64()).to_pylist()
    if batch.column(id_col).null_count:
        raise ValueError(
            f"pack_sequences_global: null {id_col!r} — packing orders "
            f"docs by id, which is undefined for null keys")
    ids = batch.column(id_col).to_pylist()
    acc: dict[int, int] = {}
    for i, n in zip(ids, toks):
        b = i // bucket_width
        acc[b] = acc.get(b, 0) + n
    return pa.table({
        "bucket": pa.array(list(acc.keys()), pa.int64()),
        "partial_tokens": pa.array(list(acc.values()), pa.int64()),
    })


def pack_sequences_global(ds, *, budget: int = 512, id_col: str = "doc_id",
                          text_col: str = "text",
                          bucket_width: int = 1024):
    """Cross-document training-sequence packing: assign every doc a
    (seq_id, seq_offset) position in the stream of fixed ``budget``-token
    windows over docs ordered by ``id_col`` -> (id, n_tokens, seq_id,
    seq_offset). seq_id = floor(cum_tokens_before / budget) — identical
    to a SQL window cum-sum, and the op Ray Data lacks natively: a
    DISTRIBUTED ORDERED PREFIX SUM.

    Two-phase, text never rides a shuffle:
    - pass 1: per-batch combiner sums tokens per id-range bucket
      (``bucket_width`` docs per bucket); one tiny groupby(bucket)
      yields the bucket histogram; the driver's exclusive scan gives
      each bucket's global token offset (n_docs/bucket_width rows —
      size it so this stays driver-sized, e.g. 1e6 buckets at 100 TB).
    - pass 2: only (id, n_tokens, bucket) triples — 24 bytes/doc —
      shuffle on bucket; each group sorts its ≤ bucket_width ids,
      local-cumsums, and adds the bucket offset. Deterministic and
      partitioning-invariant by construction.

    The materialization step (concatenate each seq_id's texts) is
    ``packed_sequences``-shaped: one groupby(seq_id) where only the
    kept text moves, chunked per window budget.
    """
    import pandas as pd

    import ray

    from ray.data.aggregate import Sum

    from ..functions.text import token_count_batch
    from ..stages.util import coalesce_small

    partial = ds.map_batches(
        _token_bucket_partials,
        fn_kwargs={"id_col": id_col, "text_col": text_col,
                   "bucket_width": bucket_width},
        batch_format="pyarrow")
    hist = coalesce_small(partial).groupby("bucket") \
        .aggregate(Sum("partial_tokens")).take_all()

    offsets: dict[int, int] = {}
    cum = 0
    for b, n in sorted((r["bucket"], r["sum(partial_tokens)"])
                       for r in hist):
        offsets[b] = cum
        cum += n
    off_ref = ray.put(offsets)

    def slim(batch: pa.Table) -> pa.Table:
        toks = pc.cast(token_count_batch(batch.column(text_col)), pa.int64())
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if ids.null_count:
            # a null-bearing int column converts to float64+NaN here,
            # and pa.array(NaN, int64) crashes opaquely downstream —
            # fail loudly with the same message as pass 1
            raise ValueError(
                f"pack_sequences_global: null {id_col!r} — packing "
                f"orders docs by id, which is undefined for null keys")
        # numpy floor division, NOT pc.divide: Arrow integer divide
        # truncates toward zero, so a negative id would land in a
        # different bucket here than in pass 1's Python `//` (floor)
        buckets = ids.to_numpy(zero_copy_only=False) // bucket_width
        return pa.table({id_col: ids, "n_tokens": toks,
                         "bucket": pa.array(buckets, pa.int64())})

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = group.sort_values(id_col).reset_index(drop=True)
        before = (off[g["bucket"].iloc[0]]
                  + g["n_tokens"].cumsum().shift(fill_value=0))
        return pd.DataFrame({
            id_col: g[id_col],
            "n_tokens": g["n_tokens"],
            "seq_id": (before // budget).astype("int64"),
            "seq_offset": (before % budget).astype("int64"),
        })

    return ds.map_batches(slim, batch_format="pyarrow") \
        .groupby("bucket").map_groups(scan, batch_format="pandas")


def conversation_near_dups(ds, *, threshold: float = 0.7, bands: int = 16,
                           k: int = 128, text_col: str = "text"):
    """Conversation-level near-duplicate candidate pairs — the
    transcript-dedup op (re-recorded sessions, retried agent runs):
    (conv_a, conv_b, est_jaccard >= threshold).

    Each conversation first collapses to the SEQUENCE of its per-turn
    md5 fingerprints (hex tokens, turn order, space-joined) via the
    skew-safe two-phase assembly — ~33 bytes/turn ride that shuffle,
    never the turn text. The standard MinHash-LSH pass then runs over
    turn-BIGRAM shingles of that pseudo-document, so two conversations
    match when they share most consecutive-turn pairs: order-sensitive,
    tolerant to a few inserted/edited/dropped turns, blind to
    whitespace-level noise inside turns (any single-character edit
    changes that turn's fingerprint — pair with text-level near-dup for
    fuzzier matching).
    """
    from hashlib import md5

    from .dedup import minhash_lsh_pairs

    def fp(batch: pa.Table) -> pa.Table:
        fps = [md5((t or "").encode("utf-8", "surrogatepass")).hexdigest()
               for t in batch.column(text_col).to_pylist()]
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "text": pa.array(fps, pa.large_string()),
        })

    pseudo = assemble_conversations(
        ds.map_batches(fp, batch_format="pyarrow"), sep=" ")
    return minhash_lsh_pairs(pseudo, id_col="conv_id", text_col="text",
                             k=k, bands=bands, ngram=2,
                             threshold=threshold)


def role_transitions(turns_ds, *, conv_col: str = "conv_id",
                     idx_col: str = "turn_idx", role_col: str = "role"):
    """Corpus-wide turn-role transition counts: (prev_role, role, n) —
    the Markov matrix of who-speaks-after-whom, a standard sanity check
    on chat-formatted training data (user/assistant strict alternation
    shows up as zero user->user / assistant->assistant mass).

    Shape: adjacency needs turns of one conversation co-located, so one
    groupby(conv_id) shuffle carries ONLY (conv_id, turn_idx, role) —
    never text. Each group sorts by turn_idx and collapses to at most
    |roles|^2 partial-count rows; the final groupby(prev_role, role)
    sum is over #convs x |roles|^2 tiny rows.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def slim(batch: pa.Table) -> pa.Table:
        return batch.select([conv_col, idx_col, role_col])

    def transitions(group: pa.Table) -> pa.Table:
        g = group.sort_by([(idx_col, "ascending")])
        roles = g.column(role_col).to_pylist()
        if len(roles) < 2:
            return pa.table({"prev_role": pa.array([], pa.string()),
                             "role": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64())})
        prev = np.asarray(roles[:-1], dtype=object)
        cur = np.asarray(roles[1:], dtype=object)
        t = pa.table({"prev_role": pa.array(prev, pa.string()),
                      "role": pa.array(cur, pa.string())})
        agg = t.group_by(["prev_role", "role"]).aggregate([([], "count_all")])
        return pa.table({"prev_role": agg.column("prev_role"),
                         "role": agg.column("role"),
                         "partial_n": pc.cast(agg.column("count_all"),
                                              pa.int64())})

    from ..stages.util import per_key_in_buckets

    partial = per_key_in_buckets(
        turns_ds.map_batches(slim, batch_format="pyarrow"),
        conv_col, transitions)

    agg = coalesce_small(partial).groupby(["prev_role", "role"]) \
        .aggregate(Sum("partial_n"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "prev_role": batch.column("prev_role"),
            "role": batch.column("role"),
            "n": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def repeated_turn_report(turns_ds, *, conv_col: str = "conv_id",
                         text_col: str = "text"):
    """Agent-loop detector -> (conv_id, n_turns, n_distinct,
    max_repeat): conversations whose turns repeat verbatim (retry
    loops, stuck agents) show up as max_repeat >> 1 / low distinct
    ratio — the transcript-level cousin of within-doc
    repetition_stats.

    Shape: turns pre-collapse per block to (conv, text_hash, count)
    combiner rows — text itself never shuffles — then one
    groupby(conv, hash) sum and a per-conv finalize over its distinct
    hashes.
    """
    from hashlib import md5 as _md5

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        convs = batch.column(conv_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hs = [_md5((t or "").encode("utf-8", "surrogatepass"))
              .hexdigest() for t in texts]
        t = pa.table({conv_col: pa.array(convs), "h": pa.array(hs)})
        agg = t.group_by([conv_col, "h"]).aggregate([([], "count_all")])
        return pa.table({
            conv_col: agg.column(conv_col),
            "h": agg.column("h"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = coalesce_small(
        turns_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby([conv_col, "h"]).aggregate(Sum("partial_n"))

    def finish(group: pa.Table) -> pa.Table:
        n = group.column("sum(partial_n)").to_pylist()
        return pa.table({
            conv_col: pa.array([group.column(conv_col)[0].as_py()]),
            "n_turns": pa.array([int(sum(n))], pa.int64()),
            "n_distinct": pa.array([len(n)], pa.int64()),
            "max_repeat": pa.array([int(max(n))], pa.int64()),
        })

    from ..stages.util import per_key_in_buckets

    return per_key_in_buckets(counts, conv_col, finish)
