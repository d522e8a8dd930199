"""Local NN-Descent (Dong, Moses & Li, WWW 2011) as a single-machine
NumPy kernel.

Re-expresses reference nndescent.py:9-68 with one fundamental
architectural change (SURVEY.md §3.1): the reference ran NN-Descent
*as Spark jobs per ≤α subset*, collecting/broadcasting every
intermediate (~7 driver round-trips per inner iteration,
nndescent.py:17-64). Here the whole algorithm runs inside ONE executor
task per subset — MRDF guarantees subsets fit (≤α rows), so the right
Spark granularity is one ``applyInPandas`` group, fully vectorized.

Semantics kept from the reference:
 - B[v] initialized with k random neighbors, flag=new
   (reference initial_sample, nndescent.py:194-203)
 - per round: split new/old and sample ρK of new (nndescent.py:76-100),
   build sampled reverse lists (nndescent.py:102-117), local join over
   candidate pairs (nndescent.py:139-172), merge keeping k best
   (nn_update_heap, nndescent.py:174-192)
 - terminate when changed edges < δ·n·k or round cap (nndescent.py:66-67)

Implementation difference: instead of per-pair heap pushes, each round
scatters all candidate edges into arrays and does one vectorized
top-k-per-node merge (identical fixpoint, ~100× less Python overhead).
"""

from __future__ import annotations

import numpy as np

from pyspark_mrdf_spark.functions.vector import l2_topk_candidates, pairwise_l2_sq

# Below this block size the EXACT gemm graph beats iterating: one
# BLAS matmul + one vectorized sort is ~milliseconds at n=500 where
# NN-Descent's sampling rounds cost ~1s. The bound is set by task
# MEMORY, not speed — the n×n float64 distance matrix is the limit
# (4096² × 8B = 134 MB). Between EXACT_BLOCK_MAX and TILED_EXACT_MAX
# the tiled variant keeps the same exactness with one 4096² tile pair
# in memory at a time; only above that do NN-Descent's sampled rounds
# win. MRDF's α typically lands groups well under these, so in
# practice the division forest does the pruning and leaves solve
# exactly.
EXACT_BLOCK_MAX = 4096
TILED_EXACT_MAX = 32768


def nn_descent(
    ids: np.ndarray,
    mat: np.ndarray,
    k: int,
    *,
    sample_rate: float = 1.0,
    precision: float = 0.001,
    max_rounds: int = 30,
    rng: np.random.Generator | None = None,
    k_build: int | None = None,
) -> list[tuple[int, int, float]]:
    """Approximate k-NN graph of one vector block.

    Returns edges (src_id, dst_id, dist_sq), ≤ k per src, ascending
    (dist_sq, dst). For small blocks computes the exact graph directly.

    ``k_build``: internal working list size. NN-Descent's convergence
    depends on candidate-pool width; for small k in high dimension the
    ρK pool starves (recall@5 ≈ 0.40 on uniform 64-d data). Building
    at max(k, 20) and truncating the output to k recovers ≈ 1.0 at
    the same asymptotic cost.
    """
    rng = rng or np.random.default_rng(42)
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    if n <= 1:
        return []
    k_eff = min(k, n - 1)
    if n <= EXACT_BLOCK_MAX:
        return _exact_block(ids, mat, k_eff)
    if n <= TILED_EXACT_MAX:
        return _exact_block_tiled(ids, mat, k_eff)
    k_out = k_eff
    k_eff = min(k_build if k_build is not None else max(k, 20), n - 1)

    mat = np.asarray(mat, dtype=np.float64)
    # graph state: per node, parallel arrays sorted ascending (dist, idx)
    nb_dist = np.full((n, k_eff), np.inf)
    nb_idx = np.full((n, k_eff), -1, dtype=np.int64)
    nb_new = np.zeros((n, k_eff), dtype=bool)
    # random init at distance ∞ (reference sample_infinity /
    # initial_sample, nndescent.py:70-74,194-203)
    for v in range(n):
        cand = rng.choice(n - 1, size=k_eff, replace=False)
        cand[cand >= v] += 1
        nb_idx[v] = cand
        nb_new[v] = True

    rho_k = max(1, int(sample_rate * k_eff))
    threshold = precision * n * k_eff

    for _ in range(max_rounds):
        new_lists: list[np.ndarray] = []
        old_lists: list[np.ndarray] = []
        rev_new: list[list[int]] = [[] for _ in range(n)]
        rev_old: list[list[int]] = [[] for _ in range(n)]
        for v in range(n):
            valid = nb_idx[v] >= 0
            new_pos = np.flatnonzero(nb_new[v] & valid)
            if len(new_pos) > rho_k:
                new_pos = rng.choice(new_pos, size=rho_k, replace=False)
            nb_new[v, new_pos] = False
            nl = nb_idx[v][new_pos]
            ol = nb_idx[v][~nb_new[v] & valid]
            ol = np.setdiff1d(ol, nl, assume_unique=False)
            new_lists.append(nl)
            old_lists.append(ol)
            for u in nl:
                rev_new[u].append(v)
            for u in ol:
                rev_old[u].append(v)

        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        d2s: list[np.ndarray] = []
        for v in range(n):
            rn = np.asarray(rev_new[v], dtype=np.int64)
            ro = np.asarray(rev_old[v], dtype=np.int64)
            if len(rn) > rho_k:
                rn = rng.choice(rn, size=rho_k, replace=False)
            if len(ro) > rho_k:
                ro = rng.choice(ro, size=rho_k, replace=False)
            cn = np.unique(np.concatenate([new_lists[v], rn]))
            co = np.unique(np.concatenate([old_lists[v], ro]))
            co = np.setdiff1d(co, cn, assume_unique=True)
            m_new, m_all = len(cn), len(cn) + len(co)
            if m_new == 0 or m_all < 2:
                continue
            block = np.concatenate([cn, co])
            d2 = pairwise_l2_sq(mat[block], mat[block])
            # pairs with ≥1 new member: (new i, any j>i) — the paper's
            # local join (reference get_nn_updates_to_make,
            # nndescent.py:139-172)
            ai, bi = np.triu_indices(m_all, k=1)
            keep = ai < m_new
            ai, bi = ai[keep], bi[keep]
            u1, u2 = block[ai], block[bi]
            dd = d2[ai, bi]
            srcs.append(np.concatenate([u1, u2]))
            dsts.append(np.concatenate([u2, u1]))
            d2s.append(np.concatenate([dd, dd]))

        if not srcs:
            break
        updates = _merge_round(nb_dist, nb_idx, nb_new, np.concatenate(srcs), np.concatenate(dsts), np.concatenate(d2s), k_eff)
        if updates < threshold:
            break

    edges: list[tuple[int, int, float]] = []
    for v in range(n):
        emitted = 0
        for j in range(k_eff):
            if nb_idx[v, j] >= 0 and np.isfinite(nb_dist[v, j]):
                edges.append((int(ids[v]), int(ids[nb_idx[v, j]]), float(nb_dist[v, j])))
                emitted += 1
                if emitted == k_out:
                    break
    return edges


def _merge_round(nb_dist, nb_idx, nb_new, src, dst, d2, k_eff: int) -> int:
    """Vectorized equivalent of the reference's per-update
    nn_update_heap (nndescent.py:174-192): per node, merge candidate
    edges with the current list — dedupe by dst keeping best distance,
    sort by (dist, dst), truncate to k. Returns number of changed
    slots (the reference's update counter)."""
    n = nb_dist.shape[0]
    # deduplicate identical (src, dst) candidates, keep min dist
    order = np.lexsort((d2, dst, src))
    src, dst, d2 = src[order], dst[order], d2[order]
    first = np.ones(len(src), dtype=bool)
    first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    src, dst, d2 = src[first], dst[first], d2[first]

    updates = 0
    starts = np.searchsorted(src, np.arange(n))
    ends = np.searchsorted(src, np.arange(n), side="right")
    for v in range(n):
        s, e = starts[v], ends[v]
        if s == e:
            continue
        cand_i, cand_d = dst[s:e], d2[s:e]
        valid = nb_idx[v] >= 0
        cur_i = nb_idx[v][valid]
        cur_d = nb_dist[v][valid]
        cur_n = nb_new[v][valid]
        all_i = np.concatenate([cur_i, cand_i])
        all_d = np.concatenate([cur_d, cand_d])
        all_new = np.concatenate([cur_n, np.ones(len(cand_i), dtype=bool)])
        # dedupe by dst keeping the best distance (a candidate replaces
        # a random-init ∞ entry for the same dst; identical real pairs
        # have identical distances so ties keep the current entry)
        o = np.lexsort((all_new, all_d, all_i))
        all_i, all_d, all_new = all_i[o], all_d[o], all_new[o]
        keep = np.ones(len(all_i), dtype=bool)
        keep[1:] = all_i[1:] != all_i[:-1]
        all_i, all_d, all_new = all_i[keep], all_d[keep], all_new[keep]
        o = np.lexsort((all_i, all_d))[:k_eff]
        merged_i, merged_d, merged_new = all_i[o], all_d[o], all_new[o]
        prev_finite = cur_i[np.isfinite(cur_d)]
        changed = int((~np.isin(merged_i, prev_finite)).sum())
        if changed == 0 and len(merged_i) == len(cur_i):
            continue
        updates += changed
        kk = len(merged_i)
        nb_idx[v, :kk], nb_dist[v, :kk], nb_new[v, :kk] = merged_i, merged_d, merged_new
        nb_idx[v, kk:], nb_dist[v, kk:], nb_new[v, kk:] = -1, np.inf, False
    return updates


def _exact_block_tiled(
    ids: np.ndarray, mat: np.ndarray, k: int, tile: int = EXACT_BLOCK_MAX
) -> list[tuple[int, int, float]]:
    """Exact graph for blocks up to ``TILED_EXACT_MAX``: same result as
    ``_exact_block``, but only one ``tile``² distance block is ever in
    memory. Per query tile, each corpus tile nominates its local top
    k+1 (self absorbed); the ≤ (n/tile)·(k+1) candidates per row then
    rank exactly like the one-shot kernel."""
    mat = np.asarray(mat, dtype=np.float64)
    n = len(ids)
    kk = min(k, n - 1)
    if kk <= 0:
        return []
    id_order = np.argsort(ids, kind="stable")
    xs = mat[id_order]
    self_pos = np.argsort(id_order, kind="stable")  # column of self per row
    edges: list[tuple[int, int, float]] = []
    for qs in range(0, n, tile):
        qe = min(qs + tile, n)
        cd_parts, cc_parts = [], []
        for cs in range(0, n, tile):
            ce = min(cs + tile, n)
            cand, d2 = l2_topk_candidates(mat[qs:qe], xs[cs:ce], min(kk + 1, ce - cs))
            cc_parts.append(cand + cs)
            cd_parts.append(d2)
        cc = np.concatenate(cc_parts, axis=1)
        cd = np.concatenate(cd_parts, axis=1)
        cd[cc == self_pos[qs:qe, None]] = np.inf
        ord1 = np.argsort(cc, axis=1, kind="stable")
        cc1 = np.take_along_axis(cc, ord1, axis=1)
        cd1 = np.take_along_axis(cd, ord1, axis=1)
        sel = np.argsort(cd1, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(qs, qe), sel.shape[1])
        d = np.take_along_axis(cd1, sel, axis=1).reshape(-1)
        dstc = np.take_along_axis(cc1, sel, axis=1).reshape(-1)
        finite = np.isfinite(d)
        src = ids[rows[finite]]
        dst = ids[id_order[dstc[finite]]]
        edges.extend(zip(src.tolist(), dst.tolist(), d[finite].tolist()))
    return edges


def _exact_block(ids: np.ndarray, mat: np.ndarray, k: int) -> list[tuple[int, int, float]]:
    """Exact graph for blocks up to ``EXACT_BLOCK_MAX`` — one gemm plus
    one vectorized stable sort, no Python-per-row work.

    Columns are pre-ordered by ascending id, so a stable distance
    argsort breaks ties by id — the same (dist, id) order the previous
    per-row ``lexsort`` produced, two orders of magnitude faster
    (n=2000: 7.4s → ~0.2s)."""
    mat = np.asarray(mat, dtype=np.float64)
    n = len(ids)
    kk = min(k, n - 1)
    if kk <= 0:
        return []
    id_order = np.argsort(ids, kind="stable")
    cand, d2 = l2_topk_candidates(mat, mat[id_order], kk + 1)
    # self-distance: row v sits at its own position in id order
    self_pos = np.argsort(id_order, kind="stable")
    d2[cand == self_pos[:, None]] = np.inf
    # order candidates by column (= ascending id), then stable-argsort by
    # exact distance — ties break by id, matching lexsort((ids, dist))
    ord1 = np.argsort(cand, axis=1, kind="stable")
    cand1 = np.take_along_axis(cand, ord1, axis=1)
    d21 = np.take_along_axis(d2, ord1, axis=1)
    sel = np.argsort(d21, axis=1, kind="stable")[:, :kk]
    rows = np.repeat(np.arange(n), sel.shape[1])
    d = np.take_along_axis(d21, sel, axis=1).reshape(-1)
    dstc = np.take_along_axis(cand1, sel, axis=1).reshape(-1)
    finite = np.isfinite(d)
    src = ids[rows[finite]]
    dst = ids[id_order[dstc[finite]]]
    return list(zip(src.tolist(), dst.tolist(), d[finite].tolist()))
