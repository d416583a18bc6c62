"""The pair-grid benchmark harness.

TPU-native re-design of the reference's `CoverAlgorithm` driver
(`/root/reference/benchmarking/CoverAlgorithm.py:25-317`). The reference
loops over (i, j) pairs in joblib workers writing into np.memmap matrices;
here the N x N pair grid is cut into (tile x tile) blocks, each block's
scores are computed by ONE jitted call over a batch of pairs (vmapped
kernels feeding the MXU/VPU), and blocks stream back into a host score
matrix. The lower-triangular + transpose-add symmetry trick
(`CoverAlgorithm.py:165-182`) and the resumable block ledger
(`CoverAlgorithm.py:262-292`) are preserved.

Algorithms implement:
  - ``extract_descriptors(fs) -> dict[str, np.ndarray]``: per-song compact
    descriptors (batched arrays, leading dim N).
  - ``tile_scores(row_desc, col_desc) -> dict[type, (bi, bj) array]``: pure,
    jittable scoring of the full cross product of a row block against a
    column block of songs.
  - optionally ``full_scores(desc) -> dict[type, (N, N)]``: a one-shot
    vectorized path (the analog of StrucFTM2D's overridden all_pairwise,
    `StrucFTM2D.py:173-189`).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from acoss_tpu.benchmarking.evaluation import (EvalStats, eval_statistics,
                                               write_results_csv)
from acoss_tpu.data.store import FeatureSet
from acoss_tpu.utils import profiling as _prof


class CoverAlgorithm:
    """Base class for cover-song scoring algorithms."""

    NAME = "base"
    SIMILARITY_TYPES: tuple = ("main",)
    #: similarity types holding DISTANCES (lower = more similar); these are
    #: negated before ranking (the reference's ANFScattering stores
    #: distances, `ANFScattering.py:54-67`).
    DISTANCE_TYPES: tuple = ()
    SYMMETRIC = True
    TILE = 16

    def extract_descriptors(self, fs: FeatureSet) -> dict:
        raise NotImplementedError

    def tile_scores(self, row_desc: dict, col_desc: dict) -> dict:
        raise NotImplementedError

    full_scores = None  # optional override

    def post_process(self, Ds: dict, desc: dict) -> dict:
        """Optional hook applied to the full score matrices after the
        sweep (the analog of ChenFusion's normalize_by_length +
        do_late_fusion post-passes, `ChenFusion.py:71-85`)."""
        return Ds

    def bucket_lengths(self, fs: FeatureSet) -> np.ndarray:
        """Per-song length proxy used by the bucketed sweep; defaults to
        the first ragged feature's lengths."""
        if fs.lengths:
            return fs.lengths[sorted(fs.lengths)[0]]
        return np.full(fs.n_songs, 1, np.int32)


def _slice_desc(desc: dict, lo: int, hi: int) -> dict:
    return {k: v[lo:hi] for k, v in desc.items()}


def _pad_desc(desc: dict, n_to: int) -> dict:
    out = {}
    for k, v in desc.items():
        pad = [(0, n_to - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
        if isinstance(v, jax.Array):
            # already device-resident (e.g. Serra09 ssms): pad on device —
            # pulling it to the host defeats the point
            out[k] = jax.numpy.pad(v, pad)
        else:
            out[k] = np.pad(v, pad)
    return out


def _tile_slice(desc: dict, lo: int, hi: int, tile: int) -> dict:
    """Materialize rows [lo, hi) of each descriptor (copying out of a
    disk memmap if the store is disk-backed) padded up to `tile` rows —
    host memory never holds more than the active tiles."""
    out = {}
    for k, v in desc.items():
        s = np.asarray(v[lo:hi])
        if s.shape[0] < tile:
            s = np.pad(s, [(0, tile - s.shape[0])]
                       + [(0, 0)] * (s.ndim - 1))
        out[k] = s
    return out


def _symmetrize_from_lower(D, block: int = 4096) -> None:
    """Mirror the strict lower triangle of D onto the upper triangle in
    place, blockwise (works on np.memmap without materializing the
    matrix — the Da-TACOS-scale analog of the reference's `D += D.T`,
    `CoverAlgorithm.py:180-182`, which is valid because tiles only ever
    write strictly-lower entries). Pure assignment, so the pass is
    IDEMPOTENT: a crash mid-symmetrize followed by a resume re-derives
    the same upper triangle instead of double-adding."""
    n = D.shape[0]
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        A = np.tril(np.array(D[i0:i1, i0:i1]), -1)
        D[i0:i1, i0:i1] = A + A.T
        for j0 in range(0, i0, block):
            j1 = min(j0 + block, n)
            D[j0:j1, i0:i1] = np.array(D[i0:i1, j0:j1]).T


def run_pairwise(
    algorithm: CoverAlgorithm,
    desc: dict,
    n_songs: int,
    tile: int | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 16,
    verbose: bool = False,
    tile_filter=None,
    skip_symmetrize: bool = False,
    scores_dir: str | None = None,
    device_resident: bool | None = None,
) -> dict:
    """Sweep the pair grid, returning {similarity_type: (N, N) np.float32}.

    Symmetric algorithms compute only tiles with block-row >= block-col and
    keep the strict lower triangle, then add the transpose — exactly the
    reference's combinations + D += D.T (`CoverAlgorithm.py:165-182`).

    With `checkpoint_path`, a ledger of completed tiles plus the partial
    score matrices is saved every `checkpoint_every` tiles and the sweep
    resumes from it (`do_batch`'s checkpoint/resume,
    `CoverAlgorithm.py:262-292`).

    `desc` values may be disk memmaps (`data.descstore.DescriptorStore`);
    tiles are sliced + padded on demand, so host memory stays bounded by
    the tile size. With `scores_dir`, the output score matrices are
    `.npy` memmaps in that directory instead of RAM arrays (the
    reference's memmap score files, `CoverAlgorithm.py:48-51`) and the
    checkpoint ledger stores only the done map.

    `device_resident` (default: on, unless the descriptors are disk
    memmaps) uploads the padded descriptor corpus to the device ONCE and
    slices tiles on device with traced offsets — one compile serves every
    tile and no descriptor bytes cross the host<->device link during the
    sweep. This is what makes heavy-descriptor channels (Serra09's
    20736-dim ssms_scatter, EarlySNF) feasible through a thin link; with
    fast links it still removes the per-tile transfer + dispatch cost.
    """
    if algorithm.full_scores is not None:
        Ds = {k: np.array(v, dtype=np.float32)
              for k, v in algorithm.full_scores(desc).items()}
        for D in Ds.values():
            np.fill_diagonal(D, 0.0)
        return Ds

    tile = tile or algorithm.TILE
    n_tiles = -(-n_songs // tile)

    if scores_dir is not None:
        os.makedirs(scores_dir, exist_ok=True)
        Ds = {}
        for k in algorithm.SIMILARITY_TYPES:
            fn = os.path.join(scores_dir, f"{k}.npy")
            if os.path.exists(fn):
                Ds[k] = np.lib.format.open_memmap(fn, mode="r+")
            else:
                Ds[k] = np.lib.format.open_memmap(
                    fn, mode="w+", dtype=np.float32,
                    shape=(n_songs, n_songs))
    else:
        Ds = {k: np.zeros((n_songs, n_songs), np.float32)
              for k in algorithm.SIMILARITY_TYPES}
    done = np.zeros((n_tiles, n_tiles), dtype=bool)

    if checkpoint_path and os.path.exists(checkpoint_path):
        with np.load(checkpoint_path) as z:
            if int(z["tile"]) == tile and int(z["n_songs"]) == n_songs:
                done = z["done"]
                if scores_dir is None:
                    for k in Ds:
                        Ds[k] = z[f"D::{k}"]

    if device_resident is None:
        device_resident = not any(isinstance(v, np.memmap)
                                  for v in desc.values())
    desc_dev = None
    if device_resident:
        desc_dev = jax.device_put(_pad_desc(desc, n_tiles * tile))

        @jax.jit
        def tile_at(dd, ti, tj):
            row = {k: jax.lax.dynamic_slice_in_dim(v, ti * tile, tile)
                   for k, v in dd.items()}
            col = {k: jax.lax.dynamic_slice_in_dim(v, tj * tile, tile)
                   for k, v in dd.items()}
            return algorithm.tile_scores(row, col)

    tile_fn = jax.jit(algorithm.tile_scores)
    row_idx = np.arange(tile)

    def save_ckpt():
        if not checkpoint_path:
            return
        payload = {"done": done, "tile": tile, "n_songs": n_songs}
        if scores_dir is None:
            for k, D in Ds.items():
                payload[f"D::{k}"] = D
        else:
            for D in Ds.values():
                D.flush()
        tmp = checkpoint_path + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, checkpoint_path)

    t0 = time.time()
    n_done_this_run = 0
    # Asynchronous dispatch pipelining: tile results stay ON DEVICE and
    # are read back in batched flushes (one stacked transfer per
    # `flush_every` tiles). jax dispatch is async, so the submit loop
    # races ahead and the device executes tiles back-to-back — without
    # this, a per-tile blocking readback inserts one host-link round trip
    # between every two tiles (ruinous on thin links: a 2,000-song sweep
    # is ~31k tiles).
    import jax.numpy as jnp
    flush_every = 128
    pending: list = []

    def flush_pending():
        nonlocal n_done_this_run
        if not pending:
            return
        with _prof.stages.stage("sweep:flush"):
            stacked = {
                k: np.asarray(jnp.stack([p[2][k] for p in pending]))
                for k in algorithm.SIMILARITY_TYPES}
        for b, (ti_, tj_, _) in enumerate(pending):
            ij = np.meshgrid(row_idx + ti_ * tile, row_idx + tj_ * tile,
                             indexing="ij")
            # mask: in-bounds; symmetric sweeps keep the strict lower
            keep = (ij[0] < n_songs) & (ij[1] < n_songs)
            if algorithm.SYMMETRIC:
                keep &= ij[0] > ij[1]
            else:
                keep &= ij[0] != ij[1]
            for k in stacked:
                Ds[k][ij[0][keep], ij[1][keep]] = stacked[k][b][keep]
            done[ti_, tj_] = True
            n_done_this_run += 1
        pending.clear()

    for ti in range(n_tiles):
        # Zigzag column order maximizes feature-block reuse, mirroring the
        # reference's traversal (`CoverAlgorithm.py:294-295`).
        cols = range(ti + 1) if algorithm.SYMMETRIC else range(n_tiles)
        cols = list(cols)
        if ti % 2 == 1:
            cols = cols[::-1]
        # streaming mode: pin the row tile on device for the whole
        # block-row (it would otherwise re-cross the host link once per
        # column tile)
        row = None if device_resident else jax.device_put(
            _tile_slice(desc, ti * tile, (ti + 1) * tile, tile))
        for tj in cols:
            if done[ti, tj]:
                continue
            if tile_filter is not None and not tile_filter(ti, tj):
                continue
            with _prof.stages.stage("sweep:tile"), \
                    _prof.step_annotation("tile", ti=ti, tj=tj):
                if device_resident:
                    scores = tile_at(desc_dev, np.int32(ti), np.int32(tj))
                else:
                    col = _tile_slice(desc, tj * tile, (tj + 1) * tile,
                                      tile)
                    scores = tile_fn(row, col)
            pending.append((ti, tj, scores))
            if len(pending) >= flush_every:
                flush_pending()
            if checkpoint_path and \
                    n_done_this_run // checkpoint_every != \
                    (n_done_this_run + len(pending)) // checkpoint_every:
                flush_pending()
                save_ckpt()
        if verbose:
            flush_pending()
            print(f"[{algorithm.NAME}] block-row {ti + 1}/{n_tiles} "
                  f"({time.time() - t0:.1f}s)")
    flush_pending()
    save_ckpt()

    if algorithm.SYMMETRIC and not skip_symmetrize:
        # the mirror pass is idempotent (assignment from the lower
        # triangle, never +=), so a crash at ANY point — even
        # mid-symmetrize — leaves a state a resume fixes up correctly;
        # the flag file only short-circuits the re-run
        flag = (os.path.join(scores_dir, "symmetrized.flag")
                if scores_dir is not None else None)
        if flag is None or not os.path.exists(flag):
            for k in Ds:
                if scores_dir is not None:
                    _symmetrize_from_lower(Ds[k])
                else:
                    L = np.tril(Ds[k], -1)
                    Ds[k] = L + L.T
            if flag is not None:
                with open(flag, "w") as f:
                    f.write("1")
    return Ds


def _sweep_block(
    tile_fn,
    desc_row: dict,
    desc_col: dict,
    n_rows: int,
    n_cols: int,
    sim_types,
    tile: int,
    lower_only: bool,
) -> dict:
    """Sweep a rectangular block of the pair grid with one jitted call per
    (tile x tile) sub-block. `lower_only` keeps strictly-lower tiles (the
    symmetric diagonal-block case)."""
    nt_r = -(-n_rows // tile)
    nt_c = -(-n_cols // tile)
    desc_row = _pad_desc(desc_row, nt_r * tile)
    desc_col = _pad_desc(desc_col, nt_c * tile)
    out = {k: np.zeros((n_rows, n_cols), np.float32) for k in sim_types}
    idx = np.arange(tile)
    for ti in range(nt_r):
        cols = range(min(ti + 1, nt_c)) if lower_only else range(nt_c)
        row = _slice_desc(desc_row, ti * tile, (ti + 1) * tile)
        for tj in cols:
            col = _slice_desc(desc_col, tj * tile, (tj + 1) * tile)
            scores = tile_fn(row, col)
            ij = np.meshgrid(idx + ti * tile, idx + tj * tile,
                             indexing="ij")
            keep = (ij[0] < n_rows) & (ij[1] < n_cols)
            if lower_only:
                keep &= ij[0] > ij[1]
            for k, S in scores.items():
                out[k][ij[0][keep], ij[1][keep]] = np.asarray(S)[keep]
    return out


def _pad_axis1(desc: dict, ref: dict) -> dict:
    """Pad ragged (axis-1) descriptor arrays up to the partner bucket's
    lengths so one jitted tile kernel serves the cross-bucket block."""
    out = {}
    for k, v in desc.items():
        target = ref[k].shape
        if v.ndim >= 2 and v.shape[1] < target[1]:
            pad = [(0, 0)] * v.ndim
            pad[1] = (0, target[1] - v.shape[1])
            v = np.pad(v, pad)
        out[k] = v
    return out


def _merge_bucket_descs(descs: list[dict], inv: np.ndarray) -> dict:
    """Concatenate per-bucket descriptor dicts back into caller song order
    (axis-1 padded up to the widest bucket) so `post_process` can consume
    them without a second whole-corpus extraction."""
    out = {}
    for k in descs[0]:
        arrs = [d[k] for d in descs]
        width = max(a.shape[1] for a in arrs if a.ndim >= 2) \
            if arrs[0].ndim >= 2 else None
        if width is not None:
            arrs = [np.pad(a, [(0, 0), (0, width - a.shape[1])]
                           + [(0, 0)] * (a.ndim - 2)) for a in arrs]
        out[k] = np.concatenate(arrs, axis=0)[inv]
    return out


def run_pairwise_bucketed(
    algorithm: CoverAlgorithm,
    fs: FeatureSet,
    n_buckets: int = 4,
    tile: int | None = None,
    verbose: bool = False,
    checkpoint_path: str | None = None,
    return_desc: bool = False,
):
    """Length-bucketed pair sweep: songs are grouped by length so a tile of
    pairs shares padding (the reference's ~10x song-length spread otherwise
    pads every pair to the global max — SURVEY.md section 5). Descriptors
    are extracted per bucket at the bucket's own padded length; cross-bucket
    blocks pad the shorter bucket's arrays up to the pair's max.

    Songs are processed in length-sorted order internally (so cross-bucket
    blocks always have row-index > col-index and the symmetric-score
    orientation stays consistent); the output matrices are unpermuted back.
    For a length-sorted FeatureSet the result equals `run_pairwise`
    exactly; otherwise the (arbitrary) orientation convention of symmetric
    scores is "row = longer song" instead of "row = larger index".

    With `checkpoint_path`, a bucket-block ledger (which (bi, bj) blocks
    are complete, plus the partial matrices) is saved after every block
    and the sweep resumes from it — the bucketed analog of
    `run_pairwise`'s tile ledger (`CoverAlgorithm.py:262-292`).

    Returns Ds, or (Ds, merged_desc) when `return_desc` (merged_desc is
    the per-bucket descriptors reassembled in caller order for
    `post_process` — no second extraction pass).
    """
    tile = tile or algorithm.TILE
    lengths = np.asarray(algorithm.bucket_lengths(fs))
    perm = np.argsort(lengths, kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    fs = fs.subset(perm)
    edges = np.array_split(np.arange(fs.n_songs), n_buckets)
    buckets = [e for e in edges if len(e)]
    descs = [algorithm.extract_descriptors(fs.subset(idx))
             for idx in buckets]
    tile_fn = jax.jit(algorithm.tile_scores)
    n = fs.n_songs
    nb = len(buckets)
    Ds = {k: np.zeros((n, n), np.float32)
          for k in algorithm.SIMILARITY_TYPES}
    done = np.zeros((nb, nb), dtype=bool)

    if checkpoint_path and os.path.exists(checkpoint_path):
        with np.load(checkpoint_path) as z:
            if (int(z["n_songs"]) == n and int(z["n_buckets"]) == nb
                    and int(z["tile"]) == tile):
                done = z["done"]
                for k in Ds:
                    Ds[k] = z[f"D::{k}"]

    def save_ckpt():
        if not checkpoint_path:
            return
        payload = {"done": done, "n_songs": n, "n_buckets": nb,
                   "tile": tile}
        for k, D in Ds.items():
            payload[f"D::{k}"] = D
        tmp = checkpoint_path + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, checkpoint_path)

    for bi in range(nb):
        idx_i = buckets[bi]
        for bj in range(bi + 1):
            if done[bi, bj]:
                continue
            idx_j = buckets[bj]
            if bi == bj:
                sub = _sweep_block(tile_fn, descs[bi], descs[bi],
                                   len(idx_i), len(idx_i),
                                   algorithm.SIMILARITY_TYPES, tile,
                                   lower_only=algorithm.SYMMETRIC)
                for k in Ds:
                    Ds[k][np.ix_(idx_i, idx_i)] = sub[k]
            else:
                di = _pad_axis1(descs[bi], descs[bj])
                dj = _pad_axis1(descs[bj], descs[bi])
                sub = _sweep_block(tile_fn, di, dj, len(idx_i),
                                   len(idx_j),
                                   algorithm.SIMILARITY_TYPES, tile,
                                   lower_only=False)
                for k in Ds:
                    Ds[k][np.ix_(idx_i, idx_j)] = sub[k]
                if not algorithm.SYMMETRIC:
                    sub2 = _sweep_block(tile_fn, dj, di, len(idx_j),
                                        len(idx_i),
                                        algorithm.SIMILARITY_TYPES, tile,
                                        lower_only=False)
                    for k in Ds:
                        Ds[k][np.ix_(idx_j, idx_i)] = sub2[k]
            done[bi, bj] = True
            save_ckpt()
        if verbose:
            print(f"[{algorithm.NAME}] bucket-row {bi + 1}/{nb}")
    if algorithm.SYMMETRIC:
        for k in Ds:
            tri = np.tril(Ds[k], -1)
            Ds[k] = tri + tri.T
    else:
        for k in Ds:
            np.fill_diagonal(Ds[k], 0.0)
    # unpermute back to the caller's song order
    Ds = {k: D[np.ix_(inv, inv)] for k, D in Ds.items()}
    if return_desc:
        return Ds, _merge_bucket_descs(descs, inv)
    return Ds


def benchmark(
    algorithm: CoverAlgorithm,
    fs: FeatureSet,
    tile: int | None = None,
    results_csv: str | None = None,
    checkpoint_path: str | None = None,
    verbose: bool = False,
    n_buckets: int = 1,
) -> dict[str, EvalStats]:
    """End-to-end: descriptors -> pair sweep -> retrieval metrics (+CSV).

    n_buckets > 1 uses the length-bucketed sweep (recommended for corpora
    with a wide song-length spread); both sweeps checkpoint/resume when
    `checkpoint_path` is given.
    """
    if n_buckets > 1 and algorithm.full_scores is None:
        with _prof.stages.stage("extract+sweep:bucketed"):
            Ds, desc = run_pairwise_bucketed(
                algorithm, fs, n_buckets=n_buckets, tile=tile,
                verbose=verbose, checkpoint_path=checkpoint_path,
                return_desc=True)
    else:
        with _prof.stages.stage("extract"):
            desc = algorithm.extract_descriptors(fs)
            _prof.stages.block(
                [v for v in desc.values() if isinstance(v, jax.Array)])
        with _prof.stages.stage("sweep"):
            Ds = run_pairwise(algorithm, desc, fs.n_songs, tile=tile,
                              checkpoint_path=checkpoint_path,
                              verbose=verbose)
    with _prof.stages.stage("post_process"):
        Ds = algorithm.post_process(Ds, desc)
    out = {}
    for k, D in Ds.items():
        S = -D if k in algorithm.DISTANCE_TYPES else D
        with _prof.stages.stage("eval"):
            stats = eval_statistics(S, fs.labels)
        out[k] = stats
        if verbose:
            print(f"[{algorithm.NAME}:{k}] MR={stats.mr:.3g} "
                  f"MRR={stats.mrr:.3g} MDR={stats.mdr:.3g} "
                  f"MAP={stats.map:.3g}")
        if results_csv:
            write_results_csv(results_csv, algorithm.NAME, k, stats)
    return out
