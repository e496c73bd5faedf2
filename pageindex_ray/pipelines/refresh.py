"""Continuous-ingest refresh loop: micro-wave appends + periodic compaction.

This turns the wave machinery (pipelines/merge.py append_wave, tombstone
deletes, pipelines/compact.py) into the scheduler a 100-TB training-data
pipeline actually runs — the engine's answer to the reference's
run-again-on-a-new-PDF workflow (/root/reference/pageindex/page_index.py's
whole-document re-run), upgraded to incremental semantics: already-indexed
text is NEVER re-tokenized; deletes are tombstone masks until a compaction
expunges them.

Layout (everything under one refresh root):

    root/
      current.json          atomic pointer {"index": "gen-00003", ...}
      gen-00000/            a full committed index (build / merge / compact
      gen-00001/            output — each has its own _SUCCESS)
      gen-00001.wave/       intermediate wave index (kept by append_wave for
                            crash resume, removed after the pointer flips)

Every step produces a brand-new committed index directory and flips the
pointer ONLY after the new generation's _SUCCESS exists — a reader that
resolves the pointer always opens a fully committed index, and a crash
mid-step leaves the previous generation live (re-running the step resumes
through append_wave's <out>.wave checkpoint). Old generations beyond
``keep_generations`` are pruned after the flip (the pointer's previous
target is always kept one step so in-flight readers finish).

Scale shape: the loop itself is a driver-side scheduler — all heavy work
(wave build, partition merge, compaction) is the same distributed Ray Data
machinery the one-shot paths use; nothing here touches corpus-sized data.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from ..config import BuildConfig

POINTER_NAME = "current.json"


def _pointer_path(root: str) -> str:
    return os.path.join(root, POINTER_NAME)


def _gen_name(gen: int) -> str:
    return f"gen-{gen:05d}"


def _write_pointer(root: str, gen: int, kind: str, appends_since_compact: int = 0) -> dict:
    # appends_since_compact rides the pointer so the auto-compact-every
    # schedule survives process boundaries — one CLI invocation per append
    # (the normal cron shape) must still fire the Nth-append compaction
    ptr = {
        "index": _gen_name(gen),
        "generation": gen,
        "kind": kind,
        "appends_since_compact": int(appends_since_compact),
    }
    tmp = _pointer_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ptr, f)
    os.replace(tmp, _pointer_path(root))
    return ptr


def current_index(root: str) -> str:
    """Absolute path of the live index (raises if the root is uninitialized)."""
    return os.path.join(root, _load_pointer(root)["index"])


def _load_pointer(root: str) -> dict:
    try:
        with open(_pointer_path(root)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"refresh root {root!r} is not initialized (no {POINTER_NAME}); "
            "run init (CLI: refresh --root ... --init SEED.parquet) first"
        ) from None


def _prune(root: str, live_gen: int, keep_generations: int) -> list[str]:
    removed = []
    for name in sorted(os.listdir(root)):
        if not name.startswith("gen-"):
            continue
        base = name.split(".")[0]
        try:
            g = int(base.split("-")[1])
        except (IndexError, ValueError):
            continue
        if g <= live_gen - keep_generations:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            removed.append(name)
    return removed


class RefreshRunner:
    """Driver-side scheduler for a continuously refreshed index.

    ``auto_compact_every``: compact after this many appends (0 = never
    auto-compact; ``compact()`` stays available). ``auto_compact_deleted``:
    also compact when the tombstoned fraction of the live index exceeds
    this (checked after every append/delete).
    """

    def __init__(
        self,
        root: str,
        cfg: BuildConfig | None = None,
        auto_compact_every: int = 0,
        auto_compact_deleted: float = 0.25,
        keep_generations: int = 2,
    ):
        self.root = root
        self.cfg = cfg
        self.auto_compact_every = int(auto_compact_every)
        self.auto_compact_deleted = float(auto_compact_deleted)
        # floor of 2: the pointer's previous target must survive one step so
        # in-flight readers that resolved it just before a flip finish safely
        self.keep_generations = max(2, int(keep_generations))
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ steps

    def init(self, transcripts_path) -> dict:
        """Build generation 0 from the seed corpus."""
        from .build import build_index

        if os.path.exists(_pointer_path(self.root)):
            raise ValueError(f"refresh root {self.root!r} is already initialized")
        out = os.path.join(self.root, _gen_name(0))
        report = build_index(
            transcripts_path, out, self.cfg if self.cfg is not None else BuildConfig()
        )
        ptr = _write_pointer(self.root, 0, "init")
        return {"pointer": ptr, "report": report}

    def append(self, wave_path) -> dict:
        """Append one micro-wave (conversations sorting strictly after the
        live index's) as a new generation, flip, prune, maybe auto-compact.

        Pending tombstones on the live generation are compacted away FIRST
        (merge refuses tombstoned inputs — it would silently resurrect the
        deletes), so delete-then-append always works and never wastes the
        wave build on a doomed merge; the compaction is reported under
        ``pre_compaction``."""
        from .merge import append_wave

        result_pre = None
        if self._deleted_fraction() > 0.0:
            result_pre = self.compact()
        ptr = _load_pointer(self.root)
        gen = ptr["generation"] + 1
        out = os.path.join(self.root, _gen_name(gen))
        # one pointer read: the generation arithmetic and the merge input must
        # describe the same generation
        report = append_wave(
            os.path.join(self.root, ptr["index"]), wave_path, out, cfg=self.cfg
        )
        new_ptr = _write_pointer(
            self.root,
            gen,
            "append",
            appends_since_compact=int(ptr.get("appends_since_compact", 0)) + 1,
        )
        shutil.rmtree(out + ".wave", ignore_errors=True)
        removed = _prune(self.root, gen, self.keep_generations)
        result = {"pointer": new_ptr, "report": report, "pruned": removed}
        if result_pre is not None:
            result["pre_compaction"] = result_pre
        if (
            self.auto_compact_every
            and new_ptr["appends_since_compact"] >= self.auto_compact_every
        ) or self._deleted_fraction() > self.auto_compact_deleted:
            comp = self.compact()
            result["compaction"] = comp
            if comp["pointer"]["generation"] == new_ptr["generation"]:
                # a no-tombstone SKIP rewrote the live pointer in place
                # (counter reset, same generation) — report the rewritten
                # pointer, not the pre-skip one
                result["pointer"] = comp["pointer"]
        return result

    def delete(self, doc_ids) -> dict:
        """Tombstone docs on the LIVE index (in-place sidecar — queries mask
        immediately; space is reclaimed at the next compaction)."""
        from .tombstones import add_tombstones

        out = add_tombstones(current_index(self.root), doc_ids)
        if self._deleted_fraction() > self.auto_compact_deleted:
            out = {"tombstones": out, "compaction": self.compact()}
        return out

    def compact(self) -> dict:
        """Expunge tombstoned docs into a new generation and flip. With no
        tombstones there is nothing to expunge — skipped, not an error (the
        auto policy may fire on an all-clean index)."""
        from .compact import compact_index

        if self._deleted_fraction() == 0.0:
            ptr = _load_pointer(self.root)
            if ptr.get("appends_since_compact"):
                # reset the schedule without flipping generations: rewrite the
                # pointer in place (same atomic replace as a flip)
                ptr = _write_pointer(
                    self.root, ptr["generation"], ptr["kind"], appends_since_compact=0
                )
            return {"skipped": "no tombstones", "pointer": ptr}
        ptr = _load_pointer(self.root)
        gen = ptr["generation"] + 1
        out = os.path.join(self.root, _gen_name(gen))
        report = compact_index(current_index(self.root), out)
        new_ptr = _write_pointer(self.root, gen, "compact")
        removed = _prune(self.root, gen, self.keep_generations)
        return {"pointer": new_ptr, "report": report, "pruned": removed}

    # ------------------------------------------------------------ status

    def _deleted_fraction(self) -> float:
        from .build import load_meta
        from .tombstones import load_tombstones

        idx = current_index(self.root)
        meta = load_meta(idx)
        n = int(meta.get("n_docs_live", meta["n_docs"]))
        if not n:
            return 0.0
        dead = load_tombstones(idx, expected_fingerprint=meta["fingerprint"])
        return len(dead) / n

    def status(self) -> dict:
        from .build import load_meta

        ptr = _load_pointer(self.root)
        idx = current_index(self.root)
        meta = load_meta(idx)
        return {
            "pointer": ptr,
            "index_dir": idx,
            # n_docs is the doc-ID-SPACE extent (stable across compactions so
            # external doc_id references never dangle); n_docs_live is what an
            # operator means by "how many documents" — post-compaction they
            # differ by the expunged count
            "n_docs": int(meta["n_docs"]),
            "n_docs_live": int(meta.get("n_docs_live", meta["n_docs"])),
            "deleted_fraction": round(self._deleted_fraction(), 6),
            "generations_on_disk": sorted(
                d for d in os.listdir(self.root) if d.startswith("gen-") and "." not in d
            ),
        }


def run_refresh(
    root: str,
    seed_path,
    wave_paths,
    deletes_per_wave=None,
    cfg: BuildConfig | None = None,
    auto_compact_every: int = 0,
) -> dict:
    """One-call form (CLI + tests): init from ``seed_path``, append every
    wave in order (optionally tombstoning ``deletes_per_wave[i]`` after each),
    compacting per the auto policy. Returns the final status."""
    r = RefreshRunner(root, cfg=cfg, auto_compact_every=auto_compact_every)
    r.init(seed_path)
    for i, w in enumerate(wave_paths):
        r.append(w)
        if deletes_per_wave is not None and deletes_per_wave[i] is not None:
            ids = np.asarray(list(deletes_per_wave[i]), dtype=np.int64)
            if len(ids):
                r.delete(ids)
    return r.status()
