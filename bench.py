"""Benchmark: batched ANN search throughput at 0.9 recall@10.

Methodology mirrors the reference's headline benchmark (Cost_Analysis.pdf:
10,000 queries, k=10, QPS at the smallest L reaching 0.9 10-recall@10; BANG
reports 117,647 QPS on SIFT1B on one A100-80GB). Hardware here is one TPU
chip. Datasets are self-built synthetics (the real billion-point artifacts
cannot be downloaded in this environment); all indices are built on-device
and cached under bench_data/.

Headline: 1M x 128 uint8 SIFT-like, R=64 Vamana graph, m=64 PQ. Both
HBM-resident variants are measured at tuned operating points — exactdistance
(neighbor-aligned vectors; wins at this scale) and inmemory (PQ traversal +
re-rank; the layout that scales) — and the headline is the faster one meeting
the recall target. `vs_baseline` divides this machine's QPS by the
reference's published SIFT1B number; note the dataset-scale caveat embedded
in the JSON (a 1M-point walk needs fewer iterations than a 1B-point walk).

Secondary entries:
  scale10m  — 10M x 128 uint8, scattered (non-aligned) layouts: the
              configuration that extrapolates beyond aligned-layout memory.
              Built on demand (BENCH_BUILD_10M=1) or reused from cache.
  gist960   — 100K x 960 f32 (high-dim regime, m=120 PQ)
  glove200m — 100K x 200 f32 MIPS via the +1-dim L2 reduction
Env knobs: BENCH_FAST=1 skips secondary entries; BENCH_N/D/R/M/Q override
the headline dataset.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio, ...}
"""

import gc
import json
import os
import sys
import time

import numpy as np

if os.environ.get("BANG_FORCE_CPU"):
    # hermetic validation runs: the axon TPU plugin ignores JAX_PLATFORMS,
    # force CPU through the config API before any backend touch
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

BASELINE_QPS = 117_647.0  # reference: SIFT1B on 1x A100-80GB @ 0.9 recall@10
BASELINE_NOTE = (
    "ratio = this machine's steady-state QPS (6 batches in flight, wall "
    "clock) on its largest self-built synthetic vs the reference's published "
    "SIFT1B(1B-point) A100 number; smaller datasets need fewer traversal "
    "iterations — see BASELINE.md and scale10m. qps_single_shot is one "
    "batch per call through this setup's dev tunnel, which adds ~2 RPC "
    "round trips (~35 ms) per call that a local host (like the reference's) "
    "never pays; device_qps is the chained-slope on-device figure. See "
    "REGRESSION_r2.md for the measured tunnel-latency decomposition."
)

N = int(os.environ.get("BENCH_N", 1_000_000))
D = int(os.environ.get("BENCH_D", 128))
R = int(os.environ.get("BENCH_R", 64))
M = int(os.environ.get("BENCH_M", 64))
Q = int(os.environ.get("BENCH_Q", 10_000))
K = 10
GRAPH = os.environ.get("BENCH_GRAPH", "vamana")  # "vamana" | "pruned" | "knn"
FAST = os.environ.get("BENCH_FAST", "0") == "1"
BUILD_10M = os.environ.get("BENCH_BUILD_10M", "0") == "1"
TARGET_RECALL = 90.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data")
DATA_VERSION = "v2"  # bump when make_clustered_data changes

# tuned operating points (see PROGRESS.md): exact+nbr_vecs prefers narrow
# cheap iterations; PQ prefers beam=2
VARIANT_CONFIGS = {
    "exactdistance": {"beam": 1, "extra": 6, "grid": (10, 12, 16, 20, 30, 40, 60, 100)},
    "inmemory": {"beam": 2, "extra": 11,
                 "grid": (11, 12, 14, 16, 20, 25, 30, 40, 60, 100, 160)},
}


# ---- in-process stall watchdog -------------------------------------------
# A mid-bench tunnel wedge (in-flight RPC hangs forever) would otherwise
# leave the driver with NO JSON line at all. log() doubles as the progress
# heartbeat; a daemon thread dumps whatever sections completed and exits if
# the heartbeat freezes. Threshold sits well above the worst legitimate gap
# (a fresh big-shape compile through the tunnel: minutes, cached after).
_RESULT: dict = {}
_LAST_PROGRESS = [time.time()]
_STALL_S = float(os.environ.get("BENCH_STALL_S", 1500))


def _dump_partial(reason, rc):
    partial = dict(_RESULT)
    best = 0.0
    for row in (partial.get("variants") or {}).values():
        if isinstance(row, dict):
            best = max(best, row.get("qps_pipelined") or row.get("qps") or 0.0)
    partial.setdefault("metric", f"QPS@0.9recall10_synth{N // 1000}K_1chip")
    partial.setdefault("unit", "qps")
    partial["value"] = partial.get("value", best)
    partial["vs_baseline"] = round(partial["value"] / BASELINE_QPS, 4)
    partial["error"] = reason
    print(json.dumps(partial), flush=True)
    os._exit(rc)


def _start_stall_watchdog():
    import signal
    import threading

    def watch():
        while True:
            time.sleep(30)
            if time.time() - _LAST_PROGRESS[0] > _STALL_S:
                _dump_partial(
                    f"bench stalled >{_STALL_S:.0f}s mid-run (tunnel wedge); "
                    "partial results from completed sections", 4,
                )

    threading.Thread(target=watch, daemon=True).start()
    # The caller's window may be shorter than the internal time budget — a
    # SIGTERM/SIGINT mid-run must still yield the JSON line (round 3's empty
    # scoreboard: the driver killed a silent bench). Handlers run between
    # Python bytecodes, so a kill during a section loop lands here; only a
    # kill during one wedged RPC does not — that is the watchdog's case.
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda s, f: _dump_partial(
            "killed mid-run (caller window closed); partial results from "
            "completed sections", 5,
        ))


def log(msg):
    _LAST_PROGRESS[0] = time.time()
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def prefix_for(name, n, d, r, m, graph):
    return os.path.join(CACHE, f"{name}_{DATA_VERSION}_n{n}_d{d}_r{r}_m{m}_{graph}")


def discover_big_base(cache):
    """Find complete sharded-builder bundles (scripts/build_100m.py output)
    in `cache`, largest N first (ties: highest degree R). Returns a list of
    (n, r, prefix) — the big-base bench row sweeps the first entry. Glob
    rather than a hard-coded 100M prefix: the builder writes whatever scale
    the session's window fits (machine resets have wiped bench_data/ three
    rounds running — see PROGRESS.md)."""
    import glob as _glob
    import re as _re

    cands = []
    for p in _glob.glob(os.path.join(cache, "synthg_v1_n*_shardvamana_disk.bin")):
        pref = p[: -len("_disk.bin")]
        mt = _re.search(r"_n(\d+)_d\d+_r(\d+)_m\d+_", pref)
        if mt and os.path.exists(pref + "_gt.bin"):
            cands.append((int(mt.group(1)), int(mt.group(2)), pref))
    cands.sort(reverse=True)
    return cands


def build_bundle(
    prefix, n, d, r, m, graph, n_queries, dtype=np.uint8, mips=False,
    seed=0, l_build=48, build_batch=4096, query_noise=2.0,
):
    """Build + save a synthetic index bundle (graph, PQ, queries, GT)."""
    from bang_tpu.formats import synthetic
    from bang_tpu.formats.accel import (
        build_knn_graph_jax,
        build_pruned_knn_graph_jax,
        compute_groundtruth_jax,
        encode_pq_jax,
    )
    from bang_tpu.formats.bin_io import save_bin, save_truthset
    from bang_tpu.formats.graph import GraphIndex, save_graph_index
    from bang_tpu.formats.pq import save_pq
    from bang_tpu.formats.preprocess import preprocess_data_mips, preprocess_queries_mips

    t0 = time.time()
    log(f"building {os.path.basename(prefix)}: N={n} D={d} R={r} m={m} {graph}")
    n_clusters = max(64, min(4096, n // 1000))
    data = synthetic.make_clustered_data(n, d, n_clusters=n_clusters, dtype=dtype, seed=seed)
    # heartbeat between the two quiet stages (host data gen, device GT): at
    # 10M each runs minutes with no output, and a watchdog with a 600 s stall
    # threshold kill-loops the build if the silence spans both (seen r5,
    # 04:16-04:43 UTC: three launches, zero progress)
    log(f"data generated {time.time()-t0:.0f}s")

    rng = np.random.default_rng(seed + 1)
    queries = data[rng.integers(0, n, n_queries)].astype(np.float32)
    if np.dtype(dtype) == np.uint8:
        queries += rng.normal(0, query_noise, queries.shape).astype(np.float32)
        queries = np.clip(np.rint(queries), 0, 255).astype(np.uint8)
        q_f32 = queries.astype(np.float32)
    else:
        queries += rng.normal(0, 0.05 * query_noise, queries.shape).astype(np.float32)
        q_f32 = queries

    if mips:
        # ground truth = max inner product; index/search in augmented space
        gt_ids, gt_dists = _mips_groundtruth(data, q_f32, 100)
        data = preprocess_data_mips(data)
        q_f32 = preprocess_queries_mips(q_f32)
        queries = q_f32
    else:
        gt_ids, gt_dists = compute_groundtruth_jax(data, q_f32, 100, block=1024)
    log(f"data+gt done {time.time()-t0:.0f}s")

    if graph == "vamana":
        from bang_tpu.formats.vamana import build_vamana_graph

        adj, degrees, _med = build_vamana_graph(
            data, r=r, l_build=l_build, alpha=1.44, batch=build_batch, seed=seed
        )
    elif graph == "pruned":
        adj, degrees = build_pruned_knn_graph_jax(data, r, n_random=r // 8, seed=seed)
    else:
        adj, degrees = build_knn_graph_jax(data, r, n_random=r // 8, seed=seed)
    log(f"graph built {time.time()-t0:.0f}s")

    medoid = synthetic.medoid_of(data)
    save_graph_index(prefix, GraphIndex(data, adj, degrees, medoid))
    if m:
        pq = synthetic.train_pq(data, m, seed=seed)
        pq.codes = encode_pq_jax(data, pq)
        save_pq(prefix, pq)
    save_bin(prefix + "_query.bin", queries)
    save_truthset(prefix + "_gt.bin", gt_ids, gt_dists)
    log(f"bundle saved {time.time()-t0:.0f}s")


def _mips_groundtruth(data, queries, k):
    """Exact top-k by inner product (descending), on device, blocked."""
    import jax
    import jax.numpy as jnp

    dv = jnp.asarray(data.astype(np.float32))
    nq = queries.shape[0]
    ids = np.empty((nq, k), np.uint32)
    dists = np.empty((nq, k), np.float32)
    block = 1024

    @jax.jit
    def top(qb):
        ip = jnp.einsum("qd,nd->qn", qb, dv, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        val, idx = jax.lax.top_k(ip, k)
        return idx, -val  # recall util expects ascending "distances"

    for s in range(0, nq, block):
        qb = queries[s : s + block].astype(np.float32)
        nb = qb.shape[0]
        if nb < block:
            qb = np.pad(qb, ((0, block - nb), (0, 0)))
        i, dneg = top(jnp.asarray(qb))
        ids[s : s + block] = np.asarray(i[:nb]).astype(np.uint32)
        dists[s : s + block] = np.asarray(dneg[:nb])
    return ids, dists


def _measure_point(index, search, queries, gt_ids, gt_dists, L, beam, extra,
                   n_reps=3, measure_pipelined=False, entry_mode="medoid"):
    """Measure one (L, beam, extra) operating point; returns a result row
    with per-rep wall times (the round-2 headline regression was
    undiagnosable because the JSON carried only a single number)."""
    from bang_tpu.utils.config import SearchParams
    from bang_tpu.utils.recall import calculate_recall

    nq = queries.shape[0]
    params = SearchParams(
        L=L, k=K, beam_width=beam, extra_iters=extra,
        traversal_precision="default", entry_mode=entry_mode,
    )
    ids, dists, stats = search(index, queries, params)  # compile+warm
    stats.sync()
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        ids, dists, stats = search(index, queries, params)
        stats.sync()  # stats are lazy; timing must block on completion
        times.append(time.perf_counter() - t0)
    out = {
        "L": L, "beam": beam, "extra": extra, "entry": entry_mode,
        "qps": round(nq / min(times), 1),
        "qps_median": round(nq / float(np.median(times)), 1),
        "rep_s": [round(t, 4) for t in times],
        "iters": stats.iters,
    }
    if measure_pipelined:
        # steady-state pipelined throughput: dispatch several batches, sync
        # once. Searches are async (lazy stats), so this amortizes the per-
        # call host-link round trips that dominate single-shot wall time on
        # a tunneled setup (~17 ms device + ~35 ms RPC at the 1M exact
        # operating point — the reference's local-host methodology never
        # pays that tax).
        n_pipe = 6
        outs = [search(index, queries, params) for _ in range(n_pipe)]
        outs[-1][2].sync()
        t0 = time.perf_counter()
        outs = [search(index, queries, params) for _ in range(n_pipe)]
        outs[-1][2].sync()
        out["qps_pipelined"] = round(nq / ((time.perf_counter() - t0) / n_pipe), 1)
    out["recall"] = round(
        calculate_recall(gt_ids, np.asarray(ids), K, gt_dists), 2
    )
    return out


def _refine_knee(index, search, queries, gt_ids, gt_dists, l_prev, point,
                 try_beams=(1, 2, 4)):
    """Find the recall-0.9 frontier around the first passing grid point.

    The reference reports QPS at exactly 0.9 recall (Cost_Analysis.pdf p.2);
    a first-L-above-target sweep lands wherever the grid happens to fall
    (99.5% for the exact variant). Refinement: (a) bisect L toward the knee,
    (b) walk extra_iters down, (c) try other beam widths — keep the fastest
    point still meeting the target.
    """
    best = point

    def probe(L, beam, extra, entry="medoid"):
        nonlocal best
        row = _measure_point(index, search, queries, gt_ids, gt_dists,
                             L, beam, extra, n_reps=2, entry_mode=entry)
        log(f"  refine L={L} beam={beam} extra={extra} entry={entry} "
            f"recall={row['recall']:.2f} qps={row['qps']:,.0f}")
        if row["recall"] >= TARGET_RECALL and row["qps"] > best["qps"]:
            best = row
        return row

    # (a) bisect L between the last failing grid point and the passing one
    lo, hi = l_prev, best["L"]
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if mid < K:
            break
        row = probe(mid, best["beam"], best["extra"])
        if row["recall"] >= TARGET_RECALL:
            hi = mid
        else:
            lo = mid
    # (b) cheaper iteration budgets at the best L
    for extra in range(best["extra"] - 2, -1, -2):
        row = probe(best["L"], best["beam"], extra)
        if row["recall"] < TARGET_RECALL:
            break
    # (c) other beam widths at the chosen (L, extra)
    for beam in try_beams:
        if beam != best["beam"]:
            probe(best["L"], beam, best["extra"])
    # (d) sampled entry points (models/entry.py): saves iterations when the
    # medoid->target walk dominates; one extra compile at the chosen point
    probe(best["L"], best["beam"], best["extra"], entry="sampled")
    best["frontier"] = True
    return best


def sweep_variant(
    prefix, variant, queries, gt_ids, gt_dists, grid=None, beam=None, extra=None,
    measure_serving=False, refine=True, index_kwargs=None,
):
    """L-sweep one variant to the recall target, then refine to the
    recall-0.9 frontier; returns the operating point. Frees the index's HBM
    deterministically on exit (multi-variant benches must not leak device
    memory between sweeps)."""
    from bang_tpu.models.index import device_index_from_files, free_device_index
    from bang_tpu.utils.config import SearchParams

    nq = queries.shape[0]
    cfg = VARIANT_CONFIGS[variant]
    grid = grid or cfg["grid"]
    beam = cfg["beam"] if beam is None else beam
    extra = cfg["extra"] if extra is None else extra
    index = device_index_from_files(prefix, variant=variant, **(index_kwargs or {}))
    if variant == "inmemory":
        from bang_tpu.models.inmemory import search_inmemory as search
    else:
        from bang_tpu.models.exactdistance import search_exact as search

    best = None
    l_prev = K
    for L in grid:
        point = _measure_point(index, search, queries, gt_ids, gt_dists,
                               L, beam, extra)
        log(f"{os.path.basename(prefix)} {variant} L={L} "
            f"recall={point['recall']:.2f} qps={point['qps']:,.0f} "
            f"iters={point['iters']} rep_s={point['rep_s']}")
        best = point
        if point["recall"] >= TARGET_RECALL:
            if refine:
                try:
                    best = _refine_knee(index, search, queries, gt_ids,
                                        gt_dists, l_prev, point)
                except Exception as e:  # pragma: no cover
                    # a transient remote-compile failure mid-refinement must
                    # not lose the already-measured passing point (observed:
                    # tpu_compile_helper HTTP 500 killed the gist960 row)
                    log(f"refine failed ({e}); keeping grid point")
                    best = point
            break
        l_prev = L
    best["variant"] = variant

    # re-measure the chosen operating point with the pipelined protocol
    # (5 reps + steady-state throughput) — this is the reported row
    try:
        final = _measure_point(
            index, search, queries, gt_ids, gt_dists, best["L"], best["beam"],
            best["extra"], n_reps=5, measure_pipelined=True,
            entry_mode=best.get("entry", "medoid"),
        )
        final["frontier"] = best.get("frontier", False)
        final["variant"] = variant
        best = final
    except Exception as e:  # pragma: no cover
        log(f"final re-measure failed ({e}); keeping sweep point")

    if measure_serving:
        params = SearchParams(
            L=best["L"], k=K, beam_width=best["beam"], extra_iters=best["extra"],
            traversal_precision="default", entry_mode=best.get("entry", "medoid"),
        )
        from bang_tpu.harness.serving import measure_device_batch_latency

        # device time per 128-query batch (slope of an on-device chain; a
        # single small dispatch through the dev tunnel measures ~30-50 ms of
        # RPC latency a real host never sees — see serving.py)
        try:
            dev_ms = measure_device_batch_latency(
                index, np.asarray(queries[:128]), params, variant=variant
            )
            best["batch128_device_ms"] = round(dev_ms, 2)
        except Exception as e:  # pragma: no cover
            log(f"device latency probe failed: {e}")
        # device time of the FULL headline batch (same chained-slope trick):
        # lets a future wall-clock swing be attributed to device vs host/
        # tunnel state from the JSON alone, and feeds the bandwidth figure
        try:
            dev_full_ms = measure_device_batch_latency(
                index, np.asarray(queries), params, variant=variant, n_chain=5
            )
            best["device_ms_full_batch"] = round(dev_full_ms, 2)
            best["device_qps"] = round(nq / (dev_full_ms / 1000.0), 1)
            gb = _traversal_gather_bytes_per_iter(index, variant, nq, best["beam"])
            if gb and best.get("iters"):
                best["hbm_traversal_gbps"] = round(
                    gb * best["iters"] / (dev_full_ms / 1000.0) / 1e9, 1
                )
        except Exception as e:  # pragma: no cover
            log(f"full-batch device probe failed: {e}")
        # through-the-wire p99 (includes tunnel RPC on this setup)
        try:
            lat = []
            search(index, queries[:128], params)
            for i in range(30):
                s = (i * 128) % (nq - 128)
                t0 = time.perf_counter()
                search(index, queries[s : s + 128], params)
                lat.append((time.perf_counter() - t0) * 1000.0)
            best["p99_batch128_ms"] = round(float(np.percentile(np.asarray(lat), 99)), 2)
        except Exception as e:  # pragma: no cover
            log(f"p99 measurement failed: {e}")

    free_device_index(index)
    del index
    gc.collect()
    return best


def _traversal_gather_bytes_per_iter(index, variant, q, beam):
    """Lower-bound HBM bytes the traversal loop GATHERS per iteration (frontier
    fetch + PQ-table streaming; excludes worklist/sort traffic). Divided by
    measured device time this yields achieved gather bandwidth — comparable
    against the chip's ~800 GB/s HBM ceiling, making throughput claims
    falsifiable (the workload is gather-bound, not FLOP-bound)."""
    try:
        if variant == "exactdistance":
            if index.fused_vec_rows is not None:
                return q * beam * index.fused_vec_rows.shape[1]
            if index.nbr_vecs is not None:
                n, r, d = index.nbr_vecs.shape
                it = index.nbr_vecs.dtype.itemsize
                return q * beam * (r * d * it + r * 4 + r * 4)  # vecs+norms+adj
            r = index.adj.shape[1]
            return q * beam * r * (4 + index.vectors.shape[1] * index.vectors.dtype.itemsize)
        if variant == "inmemory":
            m = index.codes.shape[1]
            tables = q * m * 512  # packed bf16-pair tables stream per lookup
            if index.fused_rows is not None:
                return q * beam * index.fused_rows.shape[1] + tables
            if index.nbr_codes is not None:
                # adjacency rows are byte-plane u8 [N, 4R] in this mode
                r = (index.adj_planes.shape[1] // 4 if index.adj_planes
                     is not None else index.adj.shape[1])
                return q * beam * (index.nbr_codes.shape[1] + r * 4) + tables
            r = index.adj.shape[1]
            return q * beam * r * (4 + m) + tables
    except Exception:  # pragma: no cover
        return None
    return None


def sweep_base(prefix, queries_np, gt_ids, gt_dists, grid=(30, 45, 60, 90),
               beam=2, extra=16, n_pipeline=8, mmap=True, entry_mode="medoid"):
    """Base-variant row: host-RAM (mmap) graph + device PQ — the reference's
    billion-scale configuration and its published headline (bang_search.cu:
    569-1068; Cost_Analysis.pdf p.2-3). Reports the honest wall QPS (tunnel-
    bound on this setup), the stage breakdown proving gather/device overlap,
    and a device-step-derived projection for a real PCIe host."""
    from bang_tpu.models.base import BaseVariantSearcher
    from bang_tpu.utils.config import SearchParams
    from bang_tpu.utils.recall import calculate_recall

    nq = queries_np.shape[0]
    # mmap=False loads the packed graph fully into host RAM (the reference's
    # configuration: 640 GB host RAM for the 1B graph, README.md:13) — with
    # mmap the per-step host gather is page-fault bound on first touch and
    # understates a RAM-resident host's throughput.
    searcher = BaseVariantSearcher(prefix, n_pipeline_batches=n_pipeline, mmap=mmap)
    searcher.timers.enabled = True
    row = None
    for L in grid:
        params = SearchParams(L=L, k=K, beam_width=beam, extra_iters=extra,
                              entry_mode=entry_mode)
        searcher.search(queries_np[:256], params)  # compile + warm
        t0 = time.perf_counter()
        ids, _dists = searcher.search(queries_np, params)
        wall = time.perf_counter() - t0
        recall = calculate_recall(gt_ids, np.asarray(ids), K, gt_dists)
        stages = {k_: round(v, 1) for k_, v in searcher.timers.ms.items()}
        n_steps = searcher.last_n_steps
        row = {
            "variant": "base", "L": L, "beam": beam, "extra": extra,
            "recall": round(recall, 2), "qps_wall": round(nq / wall, 1),
            "wall_s": round(wall, 2), "n_device_steps": n_steps,
            # host-link round trips: readbacks are stacked (one batched
            # device_get per outer iteration, models/base.py) — the TPU
            # analog of the reference's speculative prefetch hiding
            # (bang_search.cu:1384-1521)
            "d2h_round_trips": getattr(searcher, "last_n_d2h", None),
            "steps_per_round_trip": (
                round(n_steps / searcher.last_n_d2h, 2)
                if getattr(searcher, "last_n_d2h", 0) else None
            ),
            "stage_ms": stages,
            # host gather ran concurrently with device compute iff the parts
            # sum to more than the whole (see BaseVariantSearcher.search)
            "overlap_proven": bool(
                stages.get("host_gather", 0) + stages.get("d2h_parents", 0)
                + stages.get("dispatch", 0) > stages.get("wall", wall * 1e3)
            ),
        }
        log(f"{os.path.basename(prefix)} base L={L} recall={recall:.2f} "
            f"qps_wall={row['qps_wall']:,.0f} stages={stages}")
        if recall >= TARGET_RECALL:
            break
    # Overlap A/B: the stage-sum criterion above is tunnel-noise-blind (RPC
    # latency lands in `wall` but in no stage, so the parts rarely sum past
    # the whole here even when the pipeline works). The direct proof is an
    # ablation: the same search with the pipeline OFF (one sub-batch, fully
    # serial host->device->host). Any speedup of the pipelined wall over the
    # serial wall can ONLY come from host gather / transfer / device compute
    # overlapping (the analog of the reference's 4-stream + speculative
    # pipeline, bang_search.cu:1384-1521).
    try:
        if searcher.meta.n > 20_000_000:
            raise RuntimeError("A/B skipped at >20M (serial wall too costly "
                               "for the bench window; the 10M row carries "
                               "the overlap evidence)")
        serial = BaseVariantSearcher(prefix, n_pipeline_batches=1, mmap=mmap)
        params = SearchParams(L=row["L"], k=K, beam_width=beam,
                              extra_iters=extra, entry_mode=entry_mode)
        serial.search(queries_np[:256], params)  # compile + warm
        t0 = time.perf_counter()
        serial.search(queries_np, params)
        wall_serial = time.perf_counter() - t0
        if serial.codes is not None:
            serial.codes.delete()
        row["wall_serial_s"] = round(wall_serial, 2)
        row["pipeline_speedup"] = round(wall_serial / row["wall_s"], 3)
        row["overlap_proven_ab"] = bool(row["pipeline_speedup"] > 1.1)
    except Exception as e:  # pragma: no cover
        log(f"pipeline A/B failed: {e}")
    # device-step projection: on a real PCIe host (~10 GB/s, no ~30 ms/RPC
    # tunnel tax) the pipelined loop costs ~max(host gather, device steps)
    try:
        from bang_tpu.harness.serving import measure_base_device_step_ms

        q_sub = max(1, nq // n_pipeline)
        params = SearchParams(L=row["L"], k=K, beam_width=beam,
                              extra_iters=extra, entry_mode=entry_mode)
        # n_chain must be large: one step is ~0.1-2 ms on device while the
        # per-call readback carries 15-35 ms of tunnel RPC jitter — a short
        # chain's slope drowns in that noise (measured: n_chain=9 returned
        # 0.0 at the 100M operating point)
        step_ms = measure_base_device_step_ms(
            searcher, queries_np[:q_sub], params, n_chain=129
        )
        row["device_step_ms"] = round(step_ms, 3)
        device_total_ms = step_ms * row["n_device_steps"]
        host_ms = row["stage_ms"].get("host_gather", 0.0)
        row["device_total_ms"] = round(device_total_ms, 1)
        row["projected_pcie_qps"] = round(
            nq / (max(device_total_ms, host_ms) / 1000.0), 1
        )
        # The in-loop host_gather stage wall is INFLATED on this box: the
        # tunnel's transfer serialization steals the single CPU core while
        # the gather runs (measured: the gather alone is ~0.3 ms/sub-batch
        # at 100M shapes vs ~29 ms in-loop). Calibrate the pure gather on a
        # fixed batch and attach the honest real-host projection.
        par = np.random.default_rng(0).integers(
            0, searcher.meta.n, q_sub * beam).astype(np.int32)
        searcher._host_gather(par)  # warm
        t0 = time.perf_counter()
        for _ in range(10):
            searcher._host_gather(par)
        pure_ms = (time.perf_counter() - t0) / 10 * 1000.0
        row["host_gather_pure_ms"] = round(pure_ms, 3)
        row["projected_pcie_qps_pure_host"] = round(
            nq / (max(device_total_ms, pure_ms * n_steps) / 1000.0), 1
        )
    except Exception as e:  # pragma: no cover
        log(f"base device-step probe failed: {e}")
    if searcher.codes is not None:
        searcher.codes.delete()
    return row


def streaming_row(n=200_000, dim=128, r=32, q=2048):
    """Streaming-updates microbench (models/streaming.py — no reference
    counterpart; the reference searches a frozen index): grow an index from
    empty by batched online inserts, churn 10% (delete + consolidate +
    re-insert), and verify search quality over the live set. Reports insert
    throughput and post-churn recall."""
    import jax

    from bang_tpu.models.streaming import StreamingIndex
    from bang_tpu.utils.config import SearchParams

    rng = np.random.default_rng(11)
    # Same generator as every other row (build_bundle). The previous ad-hoc
    # recipe (256 Gaussian islands at 4x separation) was a connectivity
    # pathology, not a workload: even an OFFLINE 2-pass R=32 Vamana graph
    # scores ~51 recall@L64 on it at 50K (measured round 4) because the alpha
    # prune occludes nearly all inter-island edges — while on the standard
    # clustered distribution both offline (100.0) and streamed (99.8) graphs
    # are fine. A row meant to detect churn damage must start from a healthy
    # baseline, and recall here should be comparable with the other rows.
    from bang_tpu.formats.synthetic import make_clustered_data

    pts = make_clustered_data(
        n, dim, n_clusters=max(64, n // 1000), dtype=np.float32, seed=11
    )
    queries = (pts[rng.integers(0, n, q)]
               + rng.normal(0, 0.05, (q, dim)).astype(np.float32))

    def live_recall(ids, live_ids, alias=None):
        """Exact-GT recall over the live point set, blocked to bound memory.

        `alias` maps index slot id -> original point id: re-inserted points
        land in recycled free-list slots, so the index returns slot ids that
        differ from the points' original ids (measured: counting those as
        misses understated post-churn recall by ~1 point per percent of
        re-inserted points)."""
        sub = pts[live_ids]
        gt = np.empty((q, K), np.int64)
        qn = (queries ** 2).sum(-1)
        sn = (sub.astype(np.float32) ** 2).sum(-1)
        for s in range(0, q, 256):
            blk = queries[s : s + 256]
            dd = qn[s : s + 256, None] + sn[None, :] - 2.0 * (blk @ sub.T)
            part = np.argpartition(dd, K, axis=1)[:, :K]
            od = np.take_along_axis(dd, part, axis=1)
            gt[s : s + 256] = live_ids[
                np.take_along_axis(part, np.argsort(od, axis=1), axis=1)
            ]
        ids = np.asarray(ids)
        if alias:
            ids = np.vectorize(lambda i: alias.get(int(i), int(i)))(ids)
        hits = sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, gt))
        return round(100.0 * hits / gt.size, 2)

    ix = StreamingIndex(capacity=n + 4096, dim=dim, r=r, l_build=32)
    ix.insert(pts[:4096])  # ramp + compile outside the timed region
    t0 = time.perf_counter()
    for s in range(4096, n, 4096):
        ix.insert(pts[s : s + 4096])
    jax.block_until_ready(ix.adj)
    jax.device_get(ix.degrees[:1])  # force sync (axon block_until_ready no-op)
    t_ins = time.perf_counter() - t0
    row = {"n": n, "r": r,
           "inserts_per_s": round((n - 4096) / t_ins, 1),
           "insert_wall_s": round(t_ins, 2)}

    params = SearchParams(L=64, k=K, extra_iters=24, beam_width=2)
    ids, _ = ix.search(queries[:256], params)  # warm/compile
    ids, _ = ix.search(queries, params)
    row["recall_pre_churn"] = live_recall(ids, np.arange(n))

    victims = rng.choice(n, n // 10, replace=False).astype(np.int32)
    ix.delete(victims)
    t0 = time.perf_counter()
    row["consolidate_repaired"] = ix.consolidate(batch=4096)
    row["consolidate_s"] = round(time.perf_counter() - t0, 2)
    back = victims[:4096]
    new_ids = ix.insert(pts[back])  # recycle freed slots
    alias = {int(s): int(o) for s, o in zip(new_ids, back)}

    t0 = time.perf_counter()
    ids, _ = ix.search(queries, params)
    row["qps_post_churn"] = round(q / (time.perf_counter() - t0), 1)
    live = np.ones(n, bool)
    live[victims] = False
    live[back] = True
    row["recall_post_churn"] = live_recall(ids, np.flatnonzero(live), alias)
    log(f"streaming: {row}")
    return row


def load_bundle(prefix, nq):
    import jax.numpy as jnp

    from bang_tpu.formats.bin_io import load_bin_auto, load_truthset

    queries = load_bin_auto(prefix + "_query.bin", np.uint8).astype(np.float32)[:nq]
    gt_ids, gt_dists = load_truthset(prefix + "_gt.bin")
    # Stage the query batch in HBM once, outside the timed region (the dev
    # tunnel moves H2D at ~15 MB/s; a real host does ~10 GB/s over PCIe).
    return jnp.asarray(queries), gt_ids[:nq], gt_dists[:nq]


def _probe_backend(timeouts=(300, 240, 180)):
    """Fail fast (with a JSON line) if the device backend is unreachable.

    The axon TPU tunnel can wedge such that the FIRST device op blocks
    forever (observed round 3: in-flight RPCs hang after harness churn). A
    bench that hangs reports nothing; probe in a subprocess with a timeout
    so the headline JSON always prints. Round-4 measurement of session
    establishment: healthy sessions complete the probe in ~4 s, but
    establishment randomly hangs 2-4+ min and then succeeds on a fresh
    attempt — so every attempt must cover a multi-minute hang, and retries
    are what actually recover (each subprocess is a fresh tunnel session).
    Round 3's 3x600 s budget exceeded the driver window and the fail-fast
    JSON never printed (rc=124); total stays ~12 min worst-case here."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((256, 256), jnp.bfloat16);"
            "print(float((x @ x).sum()))")
    for i, timeout_s in enumerate(timeouts):
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                               capture_output=True)
            if r.returncode == 0:
                return True
            log(f"backend probe attempt {i + 1} rc={r.returncode}: "
                f"{r.stderr.decode()[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {i + 1} timed out ({timeout_s}s)")
    return False


def main():
    os.makedirs(CACHE, exist_ok=True)
    from bang_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if not os.environ.get("BANG_FORCE_CPU") and not _probe_backend():
        print(json.dumps({
            "metric": f"QPS@0.9recall10_synth{N // 1000}K_1chip",
            "value": 0.0, "unit": "qps", "vs_baseline": 0.0,
            "error": "device backend unreachable (probe subprocess hung/"
                     "failed 150+30+30s) — the axon tunnel is down, not the "
                     "framework; rerun when the device responds",
        }))
        return
    import jax

    _start_stall_watchdog()  # a wedged RPC mid-run still yields a JSON line
    # Wall-clock budget: secondary sections are skipped once exceeded so the
    # final JSON line ALWAYS prints (a run killed mid-sweep reports nothing).
    t_start = time.time()
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET", 6000))

    def over_budget(section):
        if time.time() - t_start > budget_s:
            log(f"{section} skipped: over time budget "
                f"({time.time() - t_start:.0f}s > {budget_s:.0f}s)")
            return True
        return False

    # ---- headline: 1M SIFT-like ----
    prefix = prefix_for("synth", N, D, R, M, GRAPH)
    if not os.path.exists(prefix + "_gt.bin"):
        build_bundle(prefix, N, D, R, M, GRAPH, Q, l_build=48, build_batch=4096)
    queries, gt_ids, gt_dists = load_bundle(prefix, Q)

    # exactdistance FIRST: it is the headline candidate, and measuring it on
    # a fresh HBM pool removes any doubt about allocator residue from other
    # sweeps (round-2's official number halved unexplained; reproduction
    # attempts showed clean ~190K both fresh and after an inmemory sweep —
    # see REGRESSION_r2.md — so the order is belt-and-braces)
    results = _RESULT.setdefault("variants", {})
    for variant in ("exactdistance", "inmemory"):
        results[variant] = sweep_variant(
            prefix, variant, queries, gt_ids, gt_dists, measure_serving=True
        )
    eligible = [r for r in results.values() if r["recall"] >= TARGET_RECALL]
    best = max(eligible or results.values(), key=lambda r: r["qps"])

    # Headline protocol: steady-state pipelined wall QPS (6 batches in
    # flight, sync once). The metric NAME carries the protocol so round-over-
    # round deltas aren't misread — rounds 1-2 reported single-shot wall under
    # the unversioned name; the single-shot figure stays in qps_single_shot.
    headline_qps = best.get("qps_pipelined") or best["qps"]
    headline_proto = "QPS_pipelined" if best.get("qps_pipelined") else "QPS"
    result = _RESULT
    result.update({
        "metric": f"{headline_proto}@0.9recall10_synth{N // 1000}K_1chip",
        "value": headline_qps,
        "unit": "qps",
        "vs_baseline": round(headline_qps / BASELINE_QPS, 4),
        "baseline_note": BASELINE_NOTE,
        "recall": best["recall"],
        "variant": best["variant"],
        "frontier": best.get("frontier", False),
        "qps_single_shot": best["qps"],
        "device_qps": best.get("device_qps"),
        "L": best["L"],
        "p99_batch128_ms": best.get("p99_batch128_ms"),
        "batch128_device_ms": best.get("batch128_device_ms"),
        "num_queries": Q,
        "n_points": N,
        "graph": GRAPH,
        "variants": results,
        "backend": jax.default_backend(),
    })

    # ---- scale row: 10M, scattered layouts ----
    if not FAST and not over_budget("scale10m"):
        p10 = prefix_for("synth", 10_000_000, 128, 64, 64, "vamana")
        if os.path.exists(p10 + "_gt.bin") or BUILD_10M:
            try:
                if not os.path.exists(p10 + "_gt.bin"):
                    build_bundle(
                        p10, 10_000_000, 128, 64, 64, "vamana", Q,
                        l_build=48, build_batch=8192,
                    )
                q10, g10i, g10d = load_bundle(p10, Q)
                rows = {}
                for variant, grid, refine in (
                    # inmemory (the layout that scales) gets the frontier
                    # refinement — its knee tuning is worth the extra 10M-
                    # shape compiles; exact reaches 99%+ at the first grid
                    # point, where refinement buys little
                    ("inmemory", (12, 14, 16, 20, 30, 40, 60, 90, 130), True),
                    ("exactdistance", (10, 12, 16, 20, 30, 45, 70), False),
                ):
                    rows[variant] = sweep_variant(
                        p10, variant, q10, g10i, g10d, grid=grid, refine=refine
                    )
                result["scale10m"] = rows
                # tuned 10M point: R=32 graph + m=32 PQ so the neighbor-
                # aligned nbr_codes layout (10 GB) fits one chip's HBM — the
                # scattered path above is row-count bound (~12 ns per tiny
                # code-row gather; see PROGRESS.md round 3). Same RAM-budget
                # tradeoff as DiskANN's -B chunk selection (README.md:49).
                # Bundle built by scripts/build_10m_tuned.py (reuses the
                # source bundle's vectors + queries + ground truth).
                pt = prefix_for("synth", 10_000_000, 128, 32, 32, "vamana")
                if os.path.exists(pt + "_gt.bin"):
                    try:
                        # layout auto-select: since the R=32 fused kernel
                        # landed (_frontier_kernel_r32, FUSED32_r05.json:
                        # 1.34x over the nbr_codes two-gather path) the
                        # default picks fused rows here; nbr_codes remains
                        # the automatic fallback above the fused budget
                        result["scale10m_tuned"] = sweep_variant(
                            pt, "inmemory", q10, g10i, g10d,
                            grid=(14, 16, 20, 25, 30, 40, 60, 90),
                        )
                    except Exception as e:  # pragma: no cover
                        log(f"scale10m_tuned failed: {e}")
                        result["scale10m_tuned"] = {"error": str(e)}
                try:
                    if over_budget("base10m"):
                        raise RuntimeError("time budget")
                    result["base10m"] = sweep_base(
                        p10, np.asarray(jax.device_get(q10), np.float32),
                        g10i, g10d,
                    )
                except Exception as e:  # pragma: no cover
                    log(f"base10m failed: {e}")
                    result["base10m"] = {"error": str(e)}
                del q10
                gc.collect()
            except Exception as e:  # pragma: no cover
                log(f"scale10m failed: {e}")
                result["scale10m"] = {"error": str(e)}
        else:
            # tuned-only fallback: scripts/build_10m_tuned_direct.py builds
            # the R=32/m=32 bundle standalone (same data/query/GT generator
            # and seed as the R=64 source bundle, so the artifacts stay
            # byte-compatible if the source is rebuilt later). Sweep it even
            # when the source bundle is missing — after a bench_data wipe
            # the tuned row is the scale-matched headline comparable.
            pt = prefix_for("synth", 10_000_000, 128, 32, 32, "vamana")
            if os.path.exists(pt + "_gt.bin"):
                try:
                    qt, gti, gtd = load_bundle(pt, Q)
                    result["scale10m_tuned"] = sweep_variant(
                        pt, "inmemory", qt, gti, gtd,
                        grid=(14, 16, 20, 25, 30, 40, 60, 90),
                    )
                    # base row on the tuned bundle: without it the fallback
                    # scoreboard would carry NO base-variant evidence — the
                    # reference's identity configuration (host-RAM graph +
                    # device PQ, bang_search.cu:569-1068). Same call shape
                    # as the source-bundle base10m above.
                    try:
                        if over_budget("base10m"):
                            raise RuntimeError("time budget")
                        result["base10m"] = sweep_base(
                            pt, np.asarray(jax.device_get(qt), np.float32),
                            gti, gtd,
                        )
                    except Exception as e:  # pragma: no cover
                        log(f"base10m failed: {e}")
                        result["base10m"] = {"error": str(e)}
                    del qt
                    gc.collect()
                except Exception as e:  # pragma: no cover
                    log(f"scale10m_tuned failed: {e}")
                    result["scale10m_tuned"] = {"error": str(e)}
            else:
                log("scale10m skipped (no cached index; set BENCH_BUILD_10M=1)")

    # ---- big base row: the reference's identity configuration ----
    # (runs before the breadth rows: with an R=64 graph this is the
    # round's primary evidence row and must not be starved by the time
    # budget; bundles produced by scripts/build_100m.py, the sharded
    # builder, at whatever N the session's window fit — discover them by
    # glob and sweep the largest, preferring the R=64 DiskANN-quality
    # degree (recall ~0.9 near L~100) over the first-cut single-pass R=32
    # one (needs MAX_L=512 for ~0.9 — full curve in BASE100M_r03.json))
    _cands = discover_big_base(CACHE)
    if not FAST and _cands and not over_budget("base_big"):
        _n, _r, pbig = _cands[0]
        gridbig = (60, 100, 150) if _r >= 64 else (90, 180, 512)
        # key stays scale-honest: "base100m" only when N really is 100M
        _key = f"base{_n // 1_000_000}m"
        try:
            from bang_tpu.formats.bin_io import load_bin_auto, load_truthset

            q100 = load_bin_auto(pbig + "_query.bin", np.uint8).astype(np.float32)[:Q]
            g100i, g100d = load_truthset(pbig + "_gt.bin")
            # mmap=False: the packed graph (26-39 GB at 100M) fits host RAM
            # (the reference's own configuration, bang_search.cu:311-328),
            # avoiding page-fault-bound host gathers.
            row100 = sweep_base(
                pbig, q100, g100i[:Q], g100d[:Q],
                grid=gridbig, beam=2, extra=24, mmap=False,
            )
            result[_key] = row100
            if row100 and row100.get("recall", 0) < TARGET_RECALL and not \
                    over_budget(_key + "_tuned"):
                # last-L fell short (e.g. the R=32 graph converges at 89.75
                # @ MAX_L): push with sampled entries + a wider beam at the
                # same L before conceding the target
                result[_key + "_tuned"] = sweep_base(
                    pbig, q100, g100i[:Q], g100d[:Q],
                    grid=(row100["L"],), beam=4, extra=48, mmap=False,
                    entry_mode="sampled",
                )
        except Exception as e:  # pragma: no cover
            log(f"{_key} failed: {e}")
            result[_key] = {"error": str(e)}
    else:
        _key = "base100m"  # for the ratio lookup below

    # ---- breadth rows: high-dim + MIPS ----
    if not FAST and not over_budget("breadth"):
        try:
            pg = prefix_for("gist960", 100_000, 960, 32, 120, "pruned")
            if not os.path.exists(pg + "_gt.bin"):
                build_bundle(pg, 100_000, 960, 32, 120, "pruned", 2048,
                             dtype=np.float32)
            qg, gi, gd = load_bundle(pg, 2048)
            result["gist960"] = sweep_variant(
                pg, "inmemory", qg, gi, gd, grid=(20, 32, 48, 64, 96), beam=2, extra=12
            )
        except Exception as e:  # pragma: no cover
            log(f"gist960 failed: {e}")
            result["gist960"] = {"error": str(e)}
        try:
            pm = prefix_for("glovemips", 100_000, 201, 32, 0, "pruned")
            if not os.path.exists(pm + "_gt.bin"):
                build_bundle(pm, 100_000, 200, 32, 0, "pruned", 2048,
                             dtype=np.float32, mips=True)
            qm, mi, md = load_bundle(pm, 2048)
            result["glove200_mips"] = sweep_variant(
                pm, "exactdistance", qm, mi, md, grid=(20, 32, 48, 64, 96),
                beam=1, extra=16,
            )
        except Exception as e:  # pragma: no cover
            log(f"glove200_mips failed: {e}")
            result["glove200_mips"] = {"error": str(e)}
        try:
            # SPACEV-like row: signed int8, d=100 — the reference's third
            # dtype (bang.h:85-87 instantiates <int8_t>; SPACEV1B is its
            # 106,383-QPS dataset, Cost_Analysis.pdf p.2). Completes dtype
            # coverage: u8 (SIFT-like), f32 (GIST-like), int8 here.
            ps = prefix_for("spacev", 100_000, 100, 32, 50, "pruned")
            if not os.path.exists(ps + "_gt.bin"):
                build_bundle(ps, 100_000, 100, 32, 50, "pruned", 2048,
                             dtype=np.int8)
            qs, si, sd = load_bundle(ps, 2048)
            result["spacev_int8"] = sweep_variant(
                ps, "inmemory", qs, si, sd, grid=(20, 32, 48, 64, 96), beam=2,
                extra=12,
            )
        except Exception as e:  # pragma: no cover
            log(f"spacev_int8 failed: {e}")
            result["spacev_int8"] = {"error": str(e)}

    # ---- streaming updates row (beyond-reference capability evidence) ----
    if not FAST and not over_budget("streaming"):
        try:
            result["streaming"] = streaming_row()
        except Exception as e:  # pragma: no cover
            log(f"streaming failed: {e}")
            result["streaming"] = {"error": str(e)}

    # ---- scale-matched headline ratios ----
    # `vs_baseline` divides the 1M wall number by the reference's 1B SIFT
    # figure — useful as a raw speed row but NOT scale-comparable (fewer
    # traversal iterations at 1M). Print the closest-scale ratios at top
    # level too so the honest comparable is never buried in a sub-dict.
    def _best_qps(row):
        if not isinstance(row, dict) or "error" in row:
            return None
        if row.get("recall", 0.0) < TARGET_RECALL:
            return None
        return row.get("qps_pipelined") or row.get("qps")

    cands_10m = [
        _best_qps(result.get("scale10m_tuned")),
        *(
            _best_qps(r)
            for r in (result.get("scale10m") or {}).values()
            if isinstance(r, dict)
        ),
    ]
    best10 = max((q for q in cands_10m if q), default=None)
    if best10:
        result["vs_baseline_10m"] = round(best10 / BASELINE_QPS, 4)
    q100m = _best_qps(result.get(_key)) or _best_qps(
        result.get(_key + "_tuned")
    )
    if q100m:
        # scale-honest ratio name: vs_baseline_100m only at true 100M
        result["vs_baseline_" + _key[4:]] = round(q100m / BASELINE_QPS, 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
