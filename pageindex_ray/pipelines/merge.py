"""Wave-build index merge: the 10^12-turn build path.

A corpus too large for one build wave (object-store envelope, or data that
arrives over time) is indexed as CONV-ORDERED WAVES — each wave is a normal
``build_index`` run over its conversation range with ``doc_base`` set to the
global doc_id of its first turn — and merged here WITHOUT re-tokenizing:

  - posting payloads (delta/varint doc ids, tfs, dls) are avgdl-independent,
    so a term's merged list is the byte-level concatenation of its wave
    sub-lists (waves are doc-ordered, so block order is already global);
  - the ONLY recomputed field is each block's WAND ``max_factor``, which was
    baked under the wave's local avgdl: merging changes avgdl, and a stale
    bound in the wrong direction would let WAND prune true top-k docs. The
    recompute decodes just the tf/dl varint streams (never doc ids) — the
    cheap ~40% of a full decode;
  - df/cf per (partition, term) are summed; wave hot-term sets are UNIONED
    (the query router probes primary + salted partitions for hot terms, so
    a term salted in one wave and unsalted in another resolves correctly);
  - merged meta carries the GLOBAL n_docs/total_tokens/avgdl, so query-time
    idf and factor use corpus-wide statistics — results are bit-identical
    to a monolithic build of the full corpus (tested).

Validation mirrors the build's lineage discipline: waves must be committed
(_SUCCESS), contiguous in doc_id space, conv-ordered (the global dense-rank
doc_id contract, FIXTURES.md F2), and built with identical scoring configs.
Reference analogue: the reference's fixed 10-page/20k-token node splits +
sequential accumulation (/root/reference/pageindex/page_index.py:992-1019)
— here the split unit is a wave and the accumulation is a parallel
per-partition merge.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import BuildConfig
from ..stages.codec import varint_decode
from ..stages.postings import POSTINGS_SCHEMA, stats_fingerprint

_SCORING_KEYS = ("k1", "b", "block_size", "num_partitions", "salt_factor", "tokenizer")
# pre-registry metas lack the key; they were all built with the shared default
_SCORING_DEFAULTS = {"tokenizer": "alnum-lower-v1"}


def _load(index_dir: str) -> dict:
    if not os.path.exists(os.path.join(index_dir, "_SUCCESS")):
        raise ValueError(f"wave {index_dir} has no _SUCCESS marker — refuse to merge")
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def merge_indexes(index_dirs: list[str], out_dir: str) -> dict:
    """Merge committed wave indexes into one NEW index at ``out_dir``.

    ``out_dir`` must not be one of the inputs: the docmap collection step
    clears ``out_dir/docmap`` before copying from the waves, so an in-place
    merge would destroy an input's docmap and still commit _SUCCESS."""
    out_real = os.path.realpath(out_dir)
    for d in index_dirs:
        if os.path.realpath(d) == out_real:
            raise ValueError(
                f"out_dir {out_dir!r} is also an input wave — merge writes a NEW "
                "index; merging in place would destroy the input's docmap"
            )
    t0 = time.perf_counter()
    metas = [_load(d) for d in index_dirs]
    # compacted (sparse) inputs ARE mergeable — extents stay contiguous and
    # the stats below sum LIVE counts — but PENDING tombstones are not: the
    # merged index carries no tombstone sidecar, so merging one would
    # silently resurrect its deleted docs (refresh loop: compact first)
    from .tombstones import load_tombstones

    for d, m in zip(index_dirs, metas):
        if len(load_tombstones(d, expected_fingerprint=m["fingerprint"])):
            raise ValueError(
                f"wave {d} has pending tombstones; compact it before merging "
                "(merge would silently resurrect its deleted docs)"
            )
    order = np.argsort([m.get("doc_base", 0) for m in metas])
    dirs = [index_dirs[i] for i in order]
    metas = [metas[i] for i in order]

    head = metas[0]["config"]
    for m in metas[1:]:
        for k in _SCORING_KEYS:
            mine = m["config"].get(k, _SCORING_DEFAULTS.get(k))
            theirs = head.get(k, _SCORING_DEFAULTS.get(k))
            if mine != theirs:
                raise ValueError(f"wave configs differ on {k}: {mine} != {theirs}")
    expect = metas[0].get("doc_base", 0)
    for d, m in zip(dirs, metas):
        base = m.get("doc_base", 0)
        if base != expect:
            raise ValueError(
                f"waves are not contiguous in doc_id space: {d} starts at {base}, expected {expect}"
            )
        expect = base + m["n_docs"]

    # conv ordering: the global dense-rank doc_id contract requires wave i's
    # conversations to sort strictly before wave i+1's
    offs = [pq.read_table(os.path.join(d, "conv_offsets.parquet")) for d in dirs]
    for i in range(len(offs) - 1):
        last = offs[i].column("conv_id")[-1].as_py()
        first = offs[i + 1].column("conv_id")[0].as_py()
        if not last < first:
            raise ValueError(
                f"wave conv ranges overlap/interleave: {dirs[i]} ends at {last!r}, "
                f"{dirs[i + 1]} starts at {first!r}"
            )

    n_docs = sum(m["n_docs"] for m in metas)  # doc-id-space EXTENT
    n_live = sum(int(m.get("n_docs_live", m["n_docs"])) for m in metas)
    doc_base = metas[0].get("doc_base", 0)
    # each meta's total_tokens is its LIVE total (compaction rewrites it)
    total_tokens = sum(m["total_tokens"] for m in metas)
    avgdl = total_tokens / n_live if n_live else 0.0
    cfg = BuildConfig(**head)
    hot_terms = sorted(set().union(*(set(m.get("hot_terms", [])) for m in metas)))
    fingerprint = stats_fingerprint(n_live, avgdl, cfg, hot_terms)
    k1, b = cfg.k1, cfg.b

    os.makedirs(os.path.join(out_dir, "postings"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_meta"), exist_ok=True)

    all_parts = sorted(set().union(*(set(m.get("parts_present", [])) for m in metas)))

    def _rebased_blocks(table: pa.Table) -> tuple[pa.ListArray, int]:
        """One wave-partition's ``blocks`` column with every block's
        max_factor recomputed under the MERGED avgdl — fully vectorized:
        the whole partition's tf and dl varint streams are decoded as two
        single passes over zero-copy buffer slices, factors are computed in
        one numpy expression, and per-block maxima come from one
        ``maximum.reduceat``. (Round 2 did this via to_pylist + a Python
        loop over every block — the exact pattern
        consolidate_partition_table, stages/codec.py:225-279, was built to
        eliminate on the query side.) Returns (new blocks column, total
        postings)."""
        blocks = table.column("blocks")
        if isinstance(blocks, pa.ChunkedArray):
            blocks = blocks.combine_chunks()
        if blocks.offset != 0:  # defensive: compact a sliced array
            blocks = blocks.take(np.arange(len(blocks)))
        struct = blocks.values
        counts = struct.field("count").to_numpy().astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            return blocks, 0

        def _payload(field: str) -> bytes:
            arr = struct.field(field)
            vo = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + len(arr) + 1
            ].astype(np.int64)
            return arr.buffers()[2][vo[0] : vo[-1]]

        tf = varint_decode(_payload("tfs"), total).astype(np.float64)
        dl = varint_decode(_payload("dls"), total).astype(np.float64)
        factors = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        maxf = np.maximum.reduceat(factors, starts)
        new_struct = pa.StructArray.from_arrays(
            [
                struct.field("first_doc_id"),
                struct.field("count"),
                pa.array(maxf, type=pa.float64()),
                struct.field("deltas"),
                struct.field("tfs"),
                struct.field("dls"),
            ],
            names=["first_doc_id", "count", "max_factor", "deltas", "tfs", "dls"],
        )
        return pa.ListArray.from_arrays(blocks.offsets, new_struct), total

    def merge_part(batch: pa.Table) -> pa.Table:
        out_rows = []
        for pid in batch.column("part").to_pylist():
            waves = []
            for d in dirs:
                path = os.path.join(d, "postings", f"part-{pid:05d}.parquet")
                if os.path.exists(path):
                    t = pq.read_table(path)
                    if t.num_rows:
                        waves.append(t)
            n_postings = 0
            if not waves:
                table = POSTINGS_SCHEMA.empty_table()
                n_terms = 0
            else:
                rebased = []
                for t in waves:
                    col, tot = _rebased_blocks(t)
                    n_postings += tot
                    rebased.append(t.set_column(t.column_names.index("blocks"), "blocks", col))
                # stable (term, wave) sort: same-term rows become adjacent
                # with blocks in wave (== global doc) order, so a term's
                # merged list is a pure offset regrouping of the taken
                # column. Ordering stays in C: dictionary-encode the term
                # column, rank the (small) dictionary with Arrow's string
                # sort, then stable-argsort the int ranks — no Python-object
                # string comparisons over the full vocabulary.
                import pyarrow.compute as pc

                combined = pa.concat_tables(rebased)
                dict_arr = combined.column("term").combine_chunks().dictionary_encode()
                codes = dict_arr.indices.to_numpy().astype(np.int64)
                vocab = dict_arr.dictionary
                rank = np.empty(len(vocab), dtype=np.int64)
                rank[pc.sort_indices(vocab).to_numpy()] = np.arange(len(vocab))
                rc = rank[codes]
                order = np.argsort(rc, kind="stable")  # concat order == wave order
                codes_sorted = codes[order]
                combined = combined.take(pa.array(order))
                ranks_sorted = rc[order]
                n = len(ranks_sorted)
                is_head = np.ones(n, dtype=bool)
                is_head[1:] = ranks_sorted[1:] != ranks_sorted[:-1]
                rs = np.flatnonzero(is_head)
                df_sum = np.add.reduceat(combined.column("df").to_numpy().astype(np.int64), rs)
                cf_sum = np.add.reduceat(combined.column("cf").to_numpy().astype(np.int64), rs)
                taken = combined.column("blocks")
                if isinstance(taken, pa.ChunkedArray):
                    taken = taken.combine_chunks()
                row_off = taken.offsets.to_numpy().astype(np.int32)
                new_off = np.concatenate([row_off[rs], [row_off[-1]]]).astype(np.int32)
                merged_blocks = pa.ListArray.from_arrays(pa.array(new_off, type=pa.int32()), taken.values)
                n_terms = len(rs)
                table = pa.table(
                    {
                        # head terms via the (small) dictionary: O(n_terms)
                        # instead of re-materializing the full term column
                        "term": vocab.take(pa.array(codes_sorted[rs])).cast(pa.string()),
                        "df": pa.array(df_sum, type=pa.int64()),
                        "cf": pa.array(cf_sum, type=pa.int64()),
                        "blocks": merged_blocks,
                    },
                    schema=POSTINGS_SCHEMA,
                )
            final = os.path.join(out_dir, "postings", f"part-{pid:05d}.parquet")
            tmp = os.path.join(out_dir, "postings", f".tmp-{uuid.uuid4().hex}.parquet")
            pq.write_table(table, tmp)
            os.replace(tmp, final)
            import hashlib

            with open(final, "rb") as f:
                file_md5 = hashlib.md5(f.read()).hexdigest()
            from ..stages.postings import file_identity

            lineage = {
                "part": pid,
                "n_terms": n_terms,
                "n_postings": n_postings,
                "file_md5": file_md5,
                **file_identity(final),
                "fingerprint": fingerprint,
                "wall_s": 0.0,
                "merged_from": len(dirs),
            }
            ltmp = os.path.join(out_dir, "_meta", f".tmp-{uuid.uuid4().hex}.json")
            with open(ltmp, "w") as f:
                json.dump(lineage, f)
            os.replace(ltmp, os.path.join(out_dir, "_meta", f"part-{pid:05d}.json"))
            out_rows.append({"part": pid, "n_terms": n_terms, "n_postings": n_postings})
        return pa.Table.from_pylist(
            out_rows,
            schema=pa.schema(
                [("part", pa.int64()), ("n_terms", pa.int64()), ("n_postings", pa.int64())]
            ),
        )

    report_rows = (
        ray.data.from_items([{"part": p} for p in all_parts])
        .map_batches(merge_part, batch_format="pyarrow", batch_size=4)
        .to_pandas()
    )

    merged_offsets = pa.concat_tables(offs)
    off_tmp = os.path.join(out_dir, ".conv_offsets.tmp")
    pq.write_table(merged_offsets, off_tmp)
    os.replace(off_tmp, os.path.join(out_dir, "conv_offsets.parquet"))
    from ..state.convtable import write_arrow_sidecar

    write_arrow_sidecar(merged_offsets, out_dir)

    # docmap rows already carry absolute doc ids — collect the wave files
    dm_out = os.path.join(out_dir, "docmap")
    if os.path.isdir(dm_out):
        shutil.rmtree(dm_out)
    os.makedirs(dm_out, exist_ok=True)
    for wi, d in enumerate(dirs):
        src = os.path.join(d, "docmap")
        if os.path.isdir(src):
            for fn in sorted(os.listdir(src)):
                shutil.copy(os.path.join(src, fn), os.path.join(dm_out, f"wave{wi:03d}-{fn}"))

    meta = {
        "n_docs": n_docs,
        "doc_base": doc_base,
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "fingerprint": fingerprint,
        "parts_present": all_parts,
        "hot_terms": hot_terms,
        "config": head,
        "merged_from": dirs,
        # sparse when any input wave was compacted: live count for idf/avgdl,
        # extent stays n_docs (scorer ranges / dense accumulators size off it)
        **({"n_docs_live": n_live} if n_live != n_docs else {}),
    }
    tmp = os.path.join(out_dir, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok\n")

    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_waves": len(dirs),
        "partitions_merged": len(all_parts),
        "n_postings": int(report_rows["n_postings"].sum()),
        "wall_s": time.perf_counter() - t0,
        "index_dir": out_dir,
    }


def append_wave(
    existing_index_dir: str,
    transcripts_path: str | list[str],
    out_dir: str,
    cfg: BuildConfig | None = None,
) -> dict:
    """Incremental corpus growth through the wave path in one call: build
    the new conv-ordered wave with ``doc_base`` continuing the existing
    index's doc_id space, then merge existing + wave into ``out_dir`` —
    no re-tokenization of the already-indexed corpus (the append analogue
    of the reference's run-again-on-a-new-PDF workflow, and the closest
    thing to incremental updates SURVEY §2.10 scopes in).

    The new wave's conversations must sort strictly AFTER the existing
    index's (validated by merge_indexes — the global dense-rank doc_id
    contract). The scoring config defaults to the existing index's (merge
    requires them identical). The intermediate wave index is left at
    ``<out_dir>.wave`` so a crashed append resumes the wave build instead
    of re-tokenizing."""
    from .build import build_index, load_meta

    # fail fast BEFORE tokenizing the new wave — merge_indexes would reject
    # the in-place output anyway, but only after the expensive build
    if os.path.realpath(out_dir) == os.path.realpath(existing_index_dir):
        raise ValueError(
            f"out_dir {out_dir!r} is the existing index — append writes a NEW "
            "merged index; merging in place would destroy the input's docmap"
        )
    meta = load_meta(existing_index_dir)
    base = int(meta.get("doc_base", 0)) + int(meta["n_docs"])
    if cfg is None:
        known = {k: v for k, v in meta["config"].items()}
        cfg = BuildConfig(**known)
    wave_dir = out_dir.rstrip("/") + ".wave"
    wave_report = build_index(transcripts_path, wave_dir, cfg, doc_base=base)
    report = merge_indexes([existing_index_dir, wave_dir], out_dir)
    report["wave"] = wave_report
    return report
