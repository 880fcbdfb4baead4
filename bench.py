"""Benchmark: re-ranking QPS at depth-1000 vs the CPU reference.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "QPS", "vs_baseline": N}``.

Workload (BASELINE.md config #1): an InMemoryIndex holding ``--n`` fp32
768-d vectors, re-ranking ``--queries`` queries x depth-``--depth`` in
``Mode.PASSAGE`` with precomputed query vectors (LambdaEncoder), measured
end-to-end through ``index(ranking)`` — host orchestration included.

The denominator runs the *actual reference implementation* (read-only from
/root/reference/src, with a stub for its optional nanopq dependency) on the
identical workload on CPU, and is cached in BASELINE_MEASURED.json.
"""

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO))

DIM = 768


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def ensure_backend(
    attempts: int | None = None, probe_timeout_s: int | None = None
) -> str:
    """Initialize the JAX backend, retrying transient tunnel outages.

    Round 3 scored blank because one backend-init failure escaped as a raw
    traceback (BENCH_r03.json rc=1, parsed=null).  Each attempt first
    probes ``jax.devices()`` in a SUBPROCESS with a hard timeout — on a
    broken tunnel the in-process call can hang indefinitely or poison the
    process-wide backend cache; a subprocess does neither.  Only after a
    probe succeeds is the backend initialized in-process.

    :param attempts: Max probe attempts (backoff 20/40/80/160 s between);
        default 5, override with ``FFTPU_BENCH_PROBE_ATTEMPTS``.
    :param probe_timeout_s: Per-probe subprocess timeout; default 150,
        override with ``FFTPU_BENCH_PROBE_TIMEOUT``.
    :raises RuntimeError: When every attempt fails (caller emits the JSON
        failure record).
    :return: The backend platform name.
    """
    import os
    import subprocess

    if attempts is None:
        attempts = int(os.environ.get("FFTPU_BENCH_PROBE_ATTEMPTS", "5"))
    if probe_timeout_s is None:
        probe_timeout_s = int(os.environ.get("FFTPU_BENCH_PROBE_TIMEOUT", "150"))
    # a sitecustomize may pin JAX_PLATFORMS to the TPU tunnel; an explicit
    # env override (e.g. CPU CI) must win, and only jax.config can force it
    force = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p and ',' not in p: jax.config.update('jax_platforms', p)\n"
    )
    last = "unknown"
    for i in range(attempts):
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    force
                    + "d = jax.devices(); print(jax.default_backend(), len(d))",
                ],
                capture_output=True,
                text=True,
                timeout=probe_timeout_s,
            )
            if proc.returncode == 0:
                log(
                    f"backend probe ok (attempt {i + 1}): {proc.stdout.strip()}"
                    f" in {time.perf_counter() - t0:.0f}s"
                )
                import jax

                p = os.environ.get("JAX_PLATFORMS")
                if p and "," not in p:
                    jax.config.update("jax_platforms", p)
                return jax.default_backend()
            last = proc.stderr.strip().splitlines()[-1] if proc.stderr else (
                f"probe exited {proc.returncode}"
            )
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {probe_timeout_s}s"
        log(f"backend probe failed (attempt {i + 1}/{attempts}): {last}")
        if i + 1 < attempts:
            delay = 20 * (2**i)
            log(f"retrying in {delay}s")
            time.sleep(delay)
    raise RuntimeError(f"backend unavailable after {attempts} attempts: {last}")


def make_workload(n, num_queries, depth, seed=0):
    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal(size=(n, DIM), dtype=np.float32)
    qvecs = rng.standard_normal(size=(num_queries, DIM), dtype=np.float32)
    run = {}
    queries = {}
    for q in range(num_queries):
        cand = rng.choice(n, size=depth, replace=False)
        run[f"q{q}"] = {f"p{c}": float(depth - i) for i, c in enumerate(cand)}
        queries[f"q{q}"] = f"query {q}"
    return corpus, qvecs, run, queries


def _query_map(qvecs, queries):
    """Map query text -> precomputed vector (LambdaEncoder-compatible)."""
    by_text = {f"query {i}": qvecs[i] for i in range(qvecs.shape[0])}
    return lambda text: by_text[text]


# per-loop QPS samples for the main rerank/serve configs; the final JSON
# carries the spread (min/median/max) so one `value` doesn't hide tunnel
# run-to-run variance (observed ~10% within a single bench run)
LOOP_QPS: "list[float]" = []


def _enable_compile_cache():
    """Persist XLA compilations (remote TPU compiles are minutes-slow).

    Uses the library default (``~/.cache/fastforward_tpu/xla_cache`` via
    ``Index._ensure_compile_cache``) rather than a repo-local directory:
    the home-dir cache survives workspace resets between rounds, so a
    fresh checkout's first bench still warms from disk."""
    import jax

    try:
        from fastforward_tpu.index.base import Index

        Index._ensure_compile_cache()
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log(f"compile cache unavailable: {e}")


def measure_ours(
    corpus, qvecs, run, queries, depth, repeats, precision="exact",
    hbm_budget=None, loops=2, pipelined=False, transport="f32",
    serve=None, pipeline_depth=4, progressive=False,
):
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.ranking import Ranking

    import jax

    _enable_compile_cache()
    log(
        f"backend: {jax.default_backend()} precision: {precision}"
        + (f" hbm_budget: {hbm_budget / 2**30:.1f} GiB" if hbm_budget else "")
    )
    index = InMemoryIndex(
        LambdaEncoder(_query_map(qvecs, queries)),
        mode=Mode.PASSAGE,
        precision=precision,
        hbm_budget=hbm_budget,
        score_transport=transport,
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    ranking = Ranking.from_run(run, queries=queries)

    # production warm-start: upload the table and compile the serving
    # programs off the request path (the dev-tunnel upload of an N=2M fp32
    # table alone is ~5 minutes at ~20 MB/s; PCIe-local hosts pay ~2 s)
    from fastforward_tpu.utils import compilestats

    t0 = time.perf_counter()
    with compilestats.collect() as cstats:
        # ONE preload call: on single-device resident configs the table
        # upload rides in a background thread under the program warm (the
        # warm runs against a zeros twin of the view), and the rerank /
        # serve warms run in parallel threads
        index.preload(
            warm=(len(queries), depth), serve=serve, progressive=progressive
        )
    preload_s = time.perf_counter() - t0
    pstats = getattr(index, "_preload_stats", {})
    log(
        f"ours: preload (table upload + program warm) {preload_s:.1f}s "
        f"(overlap={pstats.get('overlap')}, "
        f"progressive={pstats.get('progressive', False)}, "
        f"upload {pstats.get('upload_s', float('nan')):.1f}s, "
        f"rerank warm {pstats.get('warm_rerank_s', float('nan')):.1f}s, "
        f"serve warm {pstats.get('warm_serve_s', float('nan')):.1f}s, "
        f"upload tail {pstats.get('upload_tail_s', 0.0):.1f}s)"
    )
    if progressive and pstats.get("progressive"):
        t_join = time.perf_counter()
        index.preload_join()
        log(
            f"ours: progressive exact tail joined "
            f"{time.perf_counter() - t_join:.1f}s after preload "
            f"(exact={pstats.get('progressive_exact', False)}) — serving "
            f"was live (truncated-fp32) the whole time"
        )
    for line in cstats.report().splitlines():
        log(f"warm accounting | {line}")

    t0 = time.perf_counter()
    result = index(ranking)
    first_s = time.perf_counter() - t0
    log(f"ours: first serving call (after preload) {first_s:.1f}s")

    # best of N timing loops: a transient tunnel hiccup (or a one-off
    # Pallas failure falling back to XLA) must not be recorded as the
    # steady-state rate
    if hbm_budget:
        from fastforward_tpu.ops import host_stream

        host_stream.reset_stats()
    if serve is not None:
        # compile the fused serve program off the timed path
        index.serve(
            ranking, serve[0], serve[1],
            refine=serve[2] if len(serve) > 2 else None,
        )
    qps = 0.0
    for attempt in range(max(1, loops)):
        t0 = time.perf_counter()
        if serve is not None:
            # fused production flow: semantic scoring + interpolation +
            # top-k cut in one device program; depth-`pipeline_depth`
            # submit pipeline — in-flight tunnel round trips overlap almost
            # perfectly (bench_logs/serve_depth.log: depth-2 leaves one
            # serialized RTT exposed per call, depth 4-8 converge), and
            # only (2, Q, cutoff) packed values cross the link per call
            alpha, cutoff = serve[0], serve[1]
            refine = serve[2] if len(serve) > 2 else None
            pending = []
            for _ in range(repeats):
                fut = index.submit_serve(ranking, alpha, cutoff, refine=refine)
                assert fut.pipelined, "serve path must stay fused"
                pending.append(fut)
                if len(pending) >= pipeline_depth:
                    result = pending.pop(0).result()
            for fut in pending:
                result = fut.result()
        elif pipelined:
            # depth-`pipeline_depth` submit pipeline: later calls'
            # encode/dispatch/device execution overlap earlier calls'
            # link-bound score fetches
            pending = []
            for _ in range(repeats):
                fut = index.submit(ranking)
                assert fut.pipelined, "flagship path must defer its fetch"
                pending.append(fut)
                if len(pending) >= pipeline_depth:
                    result = pending.pop(0).result()
            for fut in pending:
                result = fut.result()
        else:
            for _ in range(repeats):
                result = index(ranking)
        elapsed = time.perf_counter() - t0
        attempt_qps = len(queries) * repeats / elapsed
        log(
            f"ours (loop {attempt + 1}): {repeats} calls in {elapsed:.3f}s "
            f"-> {attempt_qps:.1f} QPS"
        )
        LOOP_QPS.append(round(attempt_qps, 1))
        qps = max(qps, attempt_qps)
    if hbm_budget:
        s = host_stream.STATS
        log(
            f"hybrid tier over {max(1, loops) * repeats} warm calls: "
            f"{s['upload_bytes'] / 2**20:.1f} MiB host->device table "
            f"traffic ({s['uploads']} uploads, {s['block_cache_hits']} "
            f"device-block cache hits)"
        )

    # sanity: scores against host-numpy fp32 ground truth
    tolerance = {"exact": 0.05, "high": 0.05, "fast": 1.0}[precision]
    q0 = result["q0"]
    for pid in list(q0)[:3]:
        expected = float(corpus[int(pid[1:])] @ qvecs[0])
        if serve is not None:
            expected = (
                serve[0] * run["q0"][pid] + (1.0 - serve[0]) * expected
            )
        assert abs(expected - q0[pid]) < tolerance, (pid, expected, q0[pid])

    # rank fidelity: top-10 per query must match the exact fp32 ordering
    # (the north-star metric is nDCG/RR parity, not bitwise scores)
    agree = 0
    checked = 8
    for qi in range(checked):
        got = result[f"q{qi}"]
        cand_rows = np.array([int(p[1:]) for p in run[f"q{qi}"]])
        exact = corpus[cand_rows] @ qvecs[qi]
        if serve is not None:
            lex = np.array([run[f"q{qi}"][f"p{r}"] for r in cand_rows])
            exact = serve[0] * lex + (1.0 - serve[0]) * exact
        top_exact = [f"p{cand_rows[j]}" for j in np.argsort(-exact)[:10]]
        agree += int(list(got)[:10] == top_exact)
    log(f"top-10 rank agreement vs exact fp32: {agree}/{checked} queries")
    return qps


def measure_reference(corpus, qvecs, run, queries, repeats, serve=None):
    """Run the actual CPU reference implementation on the same workload.

    With ``serve=(alpha, cutoff)`` the timed loop runs the reference's full
    production flow — score, interpolate (``ranking.py:293-326``), cut
    (``ranking.py:279-291``) — matching our fused ``Index.serve``.
    """
    import importlib.metadata as importlib_metadata
    import types

    # the reference hard-imports nanopq (absent here) and its own package
    # version; neither is needed for the dense in-memory benchmark
    if "nanopq" not in sys.modules:
        stub = types.ModuleType("nanopq")
        stub.PQ = type("PQ", (), {"__init__": lambda self, **kw: None})
        stub.OPQ = type("OPQ", (), {"__init__": lambda self, **kw: None})
        sys.modules["nanopq"] = stub
    orig_version = importlib_metadata.version
    importlib_metadata.version = lambda name: (
        "0.8.0" if name == "fast-forward-indexes" else orig_version(name)
    )
    sys.path.insert(0, "/root/reference/src")
    try:
        from fast_forward.encoder import LambdaEncoder as RefLambdaEncoder
        from fast_forward.index.base import Mode as RefMode
        from fast_forward.index.memory import InMemoryIndex as RefInMemoryIndex
        from fast_forward.ranking import Ranking as RefRanking

        index = RefInMemoryIndex(
            RefLambdaEncoder(_query_map(qvecs, queries)), mode=RefMode.PASSAGE
        )
        index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
        ranking = RefRanking.from_run(run, queries=queries)

        index(ranking)  # warm-up
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = index(ranking)
            if serve is not None:
                ranking.interpolate(out, serve[0]).cut(serve[1])
        elapsed = time.perf_counter() - t0
        qps = len(queries) * repeats / elapsed
        log(f"reference: {repeats} calls in {elapsed:.3f}s -> {qps:.1f} QPS")
        return qps
    finally:
        sys.path.remove("/root/reference/src")
        importlib_metadata.version = orig_version


def measure_server(
    corpus, qvecs, run, queries, depth, repeats, precision, req_q, loops=3,
    prep_workers=2,
):
    """Config: concurrent small requests through ``utils.BatchingServer``.

    The production-concurrency story: R requests of ``req_q`` queries each
    arrive together; the server coalesces them into fused serve batches
    (one device dispatch + one tiny result fetch per batch) instead of
    paying the per-call fixed cost R times.  The sequential per-request
    ``index.serve`` loop is measured as the contrast.
    """
    import concurrent.futures

    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.ranking import Ranking
    from fastforward_tpu.utils.serving import BatchingServer

    _enable_compile_cache()
    alpha, cutoff = 0.2, 10
    index = InMemoryIndex(
        LambdaEncoder(_query_map(qvecs, queries)),
        mode=Mode.PASSAGE,
        precision=precision,
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])

    q_ids = list(run)
    requests = []
    for start in range(0, len(q_ids), req_q):
        chunk = q_ids[start : start + req_q]
        requests.append(
            Ranking.from_run(
                {q: run[q] for q in chunk},
                queries={q: queries[q] for q in chunk},
            )
        )
    log(
        f"server workload: {len(requests)} concurrent requests x "
        f"{req_q} queries x depth-{depth}"
    )

    t0 = time.perf_counter()
    index.preload(warm=(len(q_ids), depth), serve=(alpha, cutoff))
    log(f"preload (upload + full-batch serve warm): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    want0 = index.serve(requests[0], alpha, cutoff)  # warm per-request shape
    log(f"per-request serve warm: {time.perf_counter() - t0:.1f}s")

    # contrast: one-by-one serving pays the fixed per-call cost R times
    t0 = time.perf_counter()
    for r in requests:
        index.serve(r, alpha, cutoff)
    seq_s = time.perf_counter() - t0
    seq_qps = len(q_ids) / seq_s
    log(
        f"sequential serve: {len(requests)} requests in {seq_s:.3f}s "
        f"-> {seq_qps:.1f} QPS aggregate"
    )

    qps = 0.0
    with BatchingServer(
        index,
        alpha,
        cutoff,
        max_batch_queries=len(q_ids),
        max_wait_ms=5.0,
        prep_workers=prep_workers,
    ) as server:
        got0 = server.serve(requests[0])  # warm the server path
        assert list(got0["q0"]) == list(want0["q0"]), "server != serve"
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=16)
        # round-synchronized: wait for each wave of 64 before the next --
        # only ONE merged batch is ever in flight, so batch prep (the
        # cold per-batch plan build) serializes with device execution
        for attempt in range(max(1, loops)):
            t0 = time.perf_counter()
            for _ in range(repeats):
                futures = list(
                    pool.map(server.submit, requests)
                )
                for f in futures:
                    f.result()
            elapsed = time.perf_counter() - t0
            attempt_qps = len(q_ids) * repeats / elapsed
            log(
                f"round-synchronized (loop {attempt + 1}): {repeats} rounds "
                f"of {len(requests)} requests in {elapsed:.3f}s -> "
                f"{attempt_qps:.1f} QPS aggregate"
            )
        # continuous load: all rounds' requests in flight at once (a
        # loaded server has a backlog) -- the server pipelines batches,
        # prep workers build the next batches' plans while earlier
        # batches execute on device
        for attempt in range(max(1, loops)):
            t0 = time.perf_counter()
            futures = list(pool.map(server.submit, requests * repeats))
            for f in futures:
                f.result()
            elapsed = time.perf_counter() - t0
            attempt_qps = len(q_ids) * repeats / elapsed
            log(
                f"continuous (loop {attempt + 1}): "
                f"{repeats * len(requests)} requests in {elapsed:.3f}s -> "
                f"{attempt_qps:.1f} QPS aggregate"
            )
            qps = max(qps, attempt_qps)
        pool.shutdown()
    return qps, seq_qps


def bench_encoder(batch: int, length: int, repeats: int):
    """Config #2 flavor: query-tower throughput, JAX/TPU vs torch/CPU.

    Uses a randomly initialized BERT-base (identical weights on both sides
    via the conversion path) so no model download is needed; with real
    checkpoints the numbers are the same modulo weights.
    """
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from fastforward_tpu.models import bert

    _enable_compile_cache()
    torch.manual_seed(0)
    hf_model = BertModel(HFBertConfig())  # BERT-base
    hf_model.eval()
    params, config = bert.from_hf_torch(hf_model)

    rng = np.random.default_rng(0)
    # distinct inputs per iteration so no caching layer can deduplicate
    batches = [
        rng.integers(100, 10_000, size=(batch, length)).astype(np.int32)
        for _ in range(repeats)
    ]
    mask = np.ones((batch, length), dtype=np.int32)

    # time the PRODUCTION encoder program — encode + pool fused on device
    # (TransformerEncoder._encode), fetching the pooled (batch, hidden)
    # embeddings, NOT the raw (batch, len, hidden) hidden states: the
    # Encoder contract returns pooled vectors, and the unpooled fetch is
    # ~27x the bytes (3.4 MB vs 96 KB per 32-query call — transfer-bound
    # on remote-attached hosts).  Host copies are issued asynchronously
    # before collecting so the ~29 ms fixed tunnel RTT overlaps across
    # calls (same protocol as the serve pipeline).
    from fastforward_tpu.encoder.transformer import _encode_pool

    def pooled(ids_np):
        return _encode_pool(params, ids_np, mask, config, "cls", False)

    np.asarray(pooled(batches[0]))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [pooled(b) for b in batches]
        for o in outs:
            try:
                o.copy_to_host_async()
            except Exception:  # backend without async host copies
                pass
        for o in outs:
            np.asarray(o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        log(f"encoder ours (encode+pool): {batch * repeats / dt:.1f} queries/s")
    ours = batch * repeats / best
    ids = batches[0]

    with torch.no_grad():
        t_ids = torch.tensor(ids.astype(np.int64))
        t_mask = torch.tensor(mask.astype(np.int64))
        hf_model(input_ids=t_ids, attention_mask=t_mask)  # warm-up
        t0 = time.perf_counter()
        for _ in range(max(1, repeats // 5)):
            hf_model(input_ids=t_ids, attention_mask=t_mask)
        ref = batch * max(1, repeats // 5) / (time.perf_counter() - t0)
    log(f"encoder reference (torch CPU): {ref:.1f} queries/s")
    return ours, ref


def measure_ours_pq(
    corpus, qvecs, run, queries, repeats, precision="exact", hbm_budget=None
):
    """Config #3: PQ-quantized index with in-kernel ADC scoring.

    With ``hbm_budget`` the code table serves from the beyond-HBM hybrid
    tier (--config pq-stream): resident code prefix + ADC-streamed tail."""
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.quantizer import PQ
    from fastforward_tpu.ranking import Ranking

    _enable_compile_cache()
    quantizer = PQ(96, 256)  # 768 dims -> 96 uint8 codes (32x compression)
    t0 = time.perf_counter()
    quantizer.fit(corpus[: 2**16])
    log(f"PQ fit on {2**16} vectors: {time.perf_counter() - t0:.1f}s")

    index = InMemoryIndex(
        LambdaEncoder(_query_map(qvecs, queries)),
        quantizer=quantizer,
        mode=Mode.PASSAGE,
        precision=precision,
        hbm_budget=hbm_budget,
    )
    t0 = time.perf_counter()
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    log(f"encode+add: {time.perf_counter() - t0:.1f}s")
    ranking = Ranking.from_run(run, queries=queries)

    t0 = time.perf_counter()
    index.preload(warm=(len(queries), max(len(r) for r in run.values())))
    log(f"PQ preload (upload + warm): {time.perf_counter() - t0:.1f}s")
    if hbm_budget is not None:
        view = index._device_view()
        log(
            f"PQ hybrid view: kind={view.kind} resident={view.tail_start} "
            f"tail={view.host_tail.shape[0] if view.host_tail is not None else 0}"
        )
    t0 = time.perf_counter()
    index(ranking)
    log(f"PQ first serving call (after preload): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(repeats):
        index(ranking)
    qps = len(queries) * repeats / (time.perf_counter() - t0)
    log(f"PQ: {qps:.1f} QPS")
    return qps


def measure_ours_int8(
    corpus, qvecs, run, queries, repeats, precision, hbm_budget=None
):
    """Config #5: int8 scalar-quantized index (4x less HBM than fp32).

    ``precision="high"`` is lossless on the table side (int8 values are
    exactly representable in bf16), so this is the natural pairing.
    """
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.quantizer import ScalarQuantizer
    from fastforward_tpu.ranking import Ranking

    _enable_compile_cache()
    quantizer = ScalarQuantizer()
    quantizer.fit(corpus[: 2**16])
    index = InMemoryIndex(
        LambdaEncoder(_query_map(qvecs, queries)),
        quantizer=quantizer,
        mode=Mode.PASSAGE,
        precision=precision,
        hbm_budget=hbm_budget,
    )
    t0 = time.perf_counter()
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    log(f"encode+add: {time.perf_counter() - t0:.1f}s")
    ranking = Ranking.from_run(run, queries=queries)
    t0 = time.perf_counter()
    index.preload(warm=(len(queries), max(len(r) for r in run.values())))
    log(f"int8 preload (upload + warm): {time.perf_counter() - t0:.1f}s")
    if hbm_budget is not None:
        view = index._device_view()
        log(
            f"int8 hybrid view: kind={view.kind} resident={view.tail_start} "
            f"tail={view.host_tail.shape[0] if view.host_tail is not None else 0}"
        )
    t0 = time.perf_counter()
    index(ranking)
    log(f"int8 first serving call (after preload): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(repeats):
        index(ranking)
    qps = len(queries) * repeats / (time.perf_counter() - t0)
    log(f"int8: {qps:.1f} QPS")
    return qps


def make_doc_workload(n_docs, num_queries, depth, seed=0, max_psgs=7):
    """Multi-passage corpus + doc-level run (BASELINE.md config #2).

    Passage counts per doc are 1..max_psgs (avg ~(1+max)/2); query token
    batches are synthesized directly (36 ids each, TCT query length) so no
    tokenizer download is needed — both engines run the *same* BERT-base
    weights over the same tokens, ours as the jitted JAX tower, the
    reference as torch CPU.
    """
    rng = np.random.default_rng(seed)
    psg_counts = rng.integers(1, max_psgs + 1, size=n_docs)
    doc_ids = [f"d{d}" for d in range(n_docs) for _ in range(psg_counts[d])]
    n_vectors = len(doc_ids)
    corpus = rng.standard_normal(size=(n_vectors, DIM), dtype=np.float32)
    query_tokens = {
        f"query {q}": rng.integers(100, 10_000, size=36).astype(np.int32)
        for q in range(num_queries)
    }
    run = {}
    queries = {}
    for q in range(num_queries):
        cand = rng.choice(n_docs, size=depth, replace=False)
        run[f"q{q}"] = {f"d{c}": float(depth - i) for i, c in enumerate(cand)}
        queries[f"q{q}"] = f"query {q}"
    return corpus, doc_ids, query_tokens, run, queries


def _qrels_from_exact(corpus, doc_ids, qvecs, run, queries, mode="maxp"):
    """Synthetic qrels: top-5 exact-fp32 docs per query, graded 3/2/2/1/1."""
    by_doc = {}
    for row, d in enumerate(doc_ids):
        by_doc.setdefault(d, []).append(row)
    qrels = {}
    q_texts = {q_id: text for q_id, text in queries.items()}
    text_to_vec = {f"query {i}": qvecs[i] for i in range(qvecs.shape[0])}
    for q_id, cands in run.items():
        qv = text_to_vec[q_texts[q_id]]
        scores = {}
        for d in cands:
            rows = by_doc[d] if d in by_doc else [int(d[1:])]
            vals = corpus[rows] @ qv
            scores[d] = float(vals.max() if mode == "maxp" else vals[0])
        top = sorted(scores, key=scores.get, reverse=True)[:5]
        qrels[q_id] = dict(zip(top, (3, 2, 2, 1, 1)))
    return qrels


def measure_maxp(n_docs, num_queries, depth, repeats, ref_repeats, skip_baseline):
    """Config #2: OnDiskIndex (HDF5) + Mode.MAXP with a BERT query tower.

    Ours writes the HDF5 file and scores with ``hbm_cache=True``; the
    reference **loads the very same file** (byte-compatible layout) and
    scores it on CPU with the same torch weights — end-to-end parity incl.
    query encoding, with nDCG@10/RR@10 checked on both engines against
    synthetic qrels.
    """
    import shutil
    import tempfile

    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from fastforward_tpu.encoder.base import Encoder
    from fastforward_tpu.index import Mode, OnDiskIndex
    from fastforward_tpu.models import bert
    from fastforward_tpu.ranking import Ranking
    from fastforward_tpu.utils.evaluate import ndcg_at_k, rr_at_k

    _enable_compile_cache()
    corpus, doc_ids, query_tokens, run, queries = make_doc_workload(
        n_docs, num_queries, depth
    )
    log(f"maxp workload: {len(doc_ids)} vectors over {n_docs} docs")

    torch.manual_seed(0)
    hf_model = BertModel(HFBertConfig())
    hf_model.eval()
    params, config = bert.from_hf_torch(hf_model)

    class JaxTower(Encoder):
        def _encode(self, texts):
            ids = np.stack([query_tokens[t] for t in texts])
            mask = np.ones_like(ids)
            hidden = bert.encode_jit(params, ids, mask, config)
            return np.asarray(bert.pool_cls(hidden, mask))

    tmp = Path(tempfile.mkdtemp())
    try:
        index = OnDiskIndex(
            tmp / "maxp.h5", JaxTower(), mode=Mode.MAXP, hbm_cache=True
        )
        t0 = time.perf_counter()
        step = 2**16
        for i in range(0, corpus.shape[0], step):
            index.add(corpus[i : i + step], doc_ids=doc_ids[i : i + step])
        log(f"HDF5 write ({corpus.nbytes / 2**30:.1f} GiB): "
            f"{time.perf_counter() - t0:.1f}s")
        ranking = Ranking.from_run(run, queries=queries)

        t0 = time.perf_counter()
        ours_out = index(ranking)
        log(f"maxp first call (incl. compile): {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(repeats):
            ours_out = index(ranking)
        qps = num_queries * repeats / (time.perf_counter() - t0)
        log(f"maxp ours: {qps:.1f} QPS")

        qvecs = JaxTower()(list(queries.values()))
        qrels = _qrels_from_exact(corpus, doc_ids, qvecs, run, queries)
        ours_ndcg = ndcg_at_k(ours_out, qrels, 10)
        ours_rr = rr_at_k(ours_out, qrels, 10)
        log(f"maxp ours quality: nDCG@10={ours_ndcg:.4f} RR@10={ours_rr:.4f}")

        ref_qps = ref_ndcg = ref_rr = None
        if not skip_baseline:
            ref_qps, ref_ndcg, ref_rr = _measure_reference_maxp(
                tmp / "maxp.h5", hf_model, query_tokens, run, queries,
                qrels, ref_repeats,
            )
            assert abs(ours_ndcg - ref_ndcg) < 0.02, (ours_ndcg, ref_ndcg)
            assert abs(ours_rr - ref_rr) < 0.02, (ours_rr, ref_rr)
            log("maxp quality parity OK (nDCG@10 / RR@10 within 0.02)")
        return qps, ref_qps, ours_ndcg, ours_rr
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _measure_reference_maxp(
    h5_path, hf_model, query_tokens, run, queries, qrels, repeats
):
    """Reference engine on the SAME HDF5 file, torch CPU query tower."""
    import importlib.metadata as importlib_metadata
    import types

    import torch

    if "nanopq" not in sys.modules:
        stub = types.ModuleType("nanopq")
        stub.PQ = type("PQ", (), {"__init__": lambda self, **kw: None})
        stub.OPQ = type("OPQ", (), {"__init__": lambda self, **kw: None})
        sys.modules["nanopq"] = stub
    orig_version = importlib_metadata.version
    importlib_metadata.version = lambda name: (
        "0.8.0" if name == "fast-forward-indexes" else orig_version(name)
    )
    sys.path.insert(0, "/root/reference/src")
    try:
        from fast_forward.encoder.base import Encoder as RefEncoder
        from fast_forward.index.base import Mode as RefMode
        from fast_forward.index.disk import OnDiskIndex as RefOnDiskIndex
        from fast_forward.ranking import Ranking as RefRanking
        from fast_forward.util import to_ir_measures  # noqa: F401  (API check)

        class TorchTower(RefEncoder):
            def _encode(self, texts):
                ids = np.stack([query_tokens[t] for t in texts])
                with torch.no_grad():
                    out = hf_model(
                        input_ids=torch.tensor(ids.astype(np.int64)),
                        attention_mask=torch.ones(ids.shape, dtype=torch.int64),
                    )
                return out.last_hidden_state[:, 0].numpy()

        index = RefOnDiskIndex.load(
            Path(h5_path), query_encoder=TorchTower(), mode=RefMode.MAXP
        )
        ranking = RefRanking.from_run(run, queries=queries)
        out = index(ranking)  # warm-up
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = index(ranking)
        qps = len(queries) * repeats / (time.perf_counter() - t0)
        log(f"maxp reference: {qps:.1f} QPS")

        from fastforward_tpu.ranking import Ranking as OurRanking
        from fastforward_tpu.utils.evaluate import ndcg_at_k, rr_at_k

        as_ours = OurRanking.from_run(
            {q: dict(out[q]) for q in out.q_ids}, queries=queries
        )
        ndcg = ndcg_at_k(as_ours, qrels, 10)
        rr = rr_at_k(as_ours, qrels, 10)
        log(f"maxp reference quality: nDCG@10={ndcg:.4f} RR@10={rr:.4f}")
        return qps, ndcg, rr
    finally:
        sys.path.remove("/root/reference/src")
        importlib_metadata.version = orig_version


def measure_alpha_sweep(
    corpus, qvecs, run, queries, repeats, ref_repeats, skip_baseline,
    alphas=(0.1, 0.3, 0.5, 0.7, 0.9), cutoff=10,
):
    """Config #4: depth-5000 early-stopping + interpolation alpha sweep.

    For each alpha: ES-score with that alpha, interpolate with the lexical
    run, and evaluate nDCG@10/RR@10 against synthetic qrels — on both
    engines, asserting per-alpha parity.
    """
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.ranking import Ranking
    from fastforward_tpu.utils.evaluate import ndcg_at_k, rr_at_k

    _enable_compile_cache()
    depths = (500, 5000)
    index = InMemoryIndex(
        LambdaEncoder(_query_map(qvecs, queries)), mode=Mode.PASSAGE
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    ranking = Ranking.from_run(run, queries=queries)
    psg_ids = [f"p{i}" for i in range(corpus.shape[0])]
    qrels = _qrels_from_exact(
        corpus, psg_ids, qvecs, run, queries, mode="firstp"
    )

    def sweep():
        return {
            alpha: index(
                ranking,
                early_stopping=cutoff,
                early_stopping_alpha=alpha,
                early_stopping_depths=depths,
            )
            for alpha in alphas
        }

    t0 = time.perf_counter()
    sweep()  # warm-up (compile)
    log(f"alpha-sweep first pass (incl. compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(repeats):
        ours_by_alpha = sweep()
    elapsed = time.perf_counter() - t0
    qps = len(queries) * len(alphas) * repeats / elapsed
    log(f"alpha-sweep ours: {qps:.1f} QPS (ES calls across {len(alphas)} alphas)")

    ours_quality = {}
    t0 = time.perf_counter()
    for alpha, out in ours_by_alpha.items():
        mixed = ranking.interpolate(out, alpha)
        ours_quality[alpha] = (
            ndcg_at_k(mixed, qrels, 10), rr_at_k(mixed, qrels, 10)
        )
        log(f"  alpha={alpha}: nDCG@10={ours_quality[alpha][0]:.4f} "
            f"RR@10={ours_quality[alpha][1]:.4f}")
    log(
        f"metric phase ({len(alphas)} alphas x Q={len(queries)}): "
        f"{time.perf_counter() - t0:.2f}s"
    )

    ref_qps = None
    if not skip_baseline:
        ref_qps = _measure_reference_alpha_sweep(
            corpus, qvecs, run, queries, qrels, alphas, cutoff, depths,
            ours_quality, ref_repeats,
        )
    return qps, ref_qps, ours_quality


def _measure_reference_alpha_sweep(
    corpus, qvecs, run, queries, qrels, alphas, cutoff, depths,
    ours_quality, repeats,
):
    import importlib.metadata as importlib_metadata
    import types

    if "nanopq" not in sys.modules:
        stub = types.ModuleType("nanopq")
        stub.PQ = type("PQ", (), {"__init__": lambda self, **kw: None})
        stub.OPQ = type("OPQ", (), {"__init__": lambda self, **kw: None})
        sys.modules["nanopq"] = stub
    orig_version = importlib_metadata.version
    importlib_metadata.version = lambda name: (
        "0.8.0" if name == "fast-forward-indexes" else orig_version(name)
    )
    sys.path.insert(0, "/root/reference/src")
    try:
        from fast_forward.encoder import LambdaEncoder as RefLambdaEncoder
        from fast_forward.index.base import Mode as RefMode
        from fast_forward.index.memory import InMemoryIndex as RefInMemoryIndex
        from fast_forward.ranking import Ranking as RefRanking

        from fastforward_tpu.ranking import Ranking as OurRanking
        from fastforward_tpu.utils.evaluate import ndcg_at_k, rr_at_k

        index = RefInMemoryIndex(
            RefLambdaEncoder(_query_map(qvecs, queries)), mode=RefMode.PASSAGE
        )
        index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
        ranking = RefRanking.from_run(run, queries=queries)

        t0 = time.perf_counter()
        outs = {}
        for _ in range(repeats):
            for alpha in alphas:
                outs[alpha] = index(
                    ranking,
                    early_stopping=cutoff,
                    early_stopping_alpha=alpha,
                    early_stopping_depths=depths,
                )
        elapsed = time.perf_counter() - t0
        qps = len(queries) * len(alphas) * repeats / elapsed
        log(f"alpha-sweep reference: {qps:.1f} QPS")

        for alpha, ref_out in outs.items():
            mixed = RefRanking.interpolate(ranking, ref_out, alpha)
            as_ours = OurRanking.from_run(
                {q: dict(mixed[q]) for q in mixed.q_ids}, queries=queries
            )
            ndcg, rr = ndcg_at_k(as_ours, qrels, 10), rr_at_k(as_ours, qrels, 10)
            log(f"  ref alpha={alpha}: nDCG@10={ndcg:.4f} RR@10={rr:.4f}")
            o_ndcg, o_rr = ours_quality[alpha]
            assert abs(o_ndcg - ndcg) < 0.02, (alpha, o_ndcg, ndcg)
            assert abs(o_rr - rr) < 0.02, (alpha, o_rr, rr)
        log("alpha-sweep quality parity OK (per-alpha nDCG/RR within 0.02)")
        return qps
    finally:
        sys.path.remove("/root/reference/src")
        importlib_metadata.version = orig_version


def _memory_child(which: str, n: int) -> None:
    """Subprocess body for --config memory: build an N-vector index from a
    chunked stream and print peak RSS (the corpus is generated chunk by
    chunk so the index store dominates the high-water mark)."""
    import resource

    step = 2**16
    rng = np.random.default_rng(0)

    def chunks():
        remaining = n
        start = 0
        while remaining:
            m = min(step, remaining)
            yield start, rng.standard_normal(size=(m, DIM), dtype=np.float32)
            remaining -= m
            start += m

    if which == "ours":
        from fastforward_tpu.encoder import LambdaEncoder
        from fastforward_tpu.index import InMemoryIndex, Mode

        _enable_compile_cache()
        index = InMemoryIndex(
            LambdaEncoder(lambda _: np.zeros(DIM, np.float32)),
            mode=Mode.PASSAGE,
            store="device",
            init_size=n,
        )
        for start, c in chunks():
            index.add(
                c, psg_ids=[f"p{j}" for j in range(start, start + c.shape[0])]
            )
        assert index._device_view() is not None
        assert len(index) == n
    else:
        import importlib.metadata as importlib_metadata
        import types

        if "nanopq" not in sys.modules:
            stub = types.ModuleType("nanopq")
            stub.PQ = type("PQ", (), {"__init__": lambda self, **kw: None})
            stub.OPQ = type("OPQ", (), {"__init__": lambda self, **kw: None})
            sys.modules["nanopq"] = stub
        orig = importlib_metadata.version
        importlib_metadata.version = lambda name: (
            "0.8.0" if name == "fast-forward-indexes" else orig(name)
        )
        sys.path.insert(0, "/root/reference/src")
        from fast_forward.encoder import LambdaEncoder as RefLambdaEncoder
        from fast_forward.index.base import Mode as RefMode
        from fast_forward.index.memory import InMemoryIndex as RefInMemoryIndex

        index = RefInMemoryIndex(
            RefLambdaEncoder(lambda _: np.zeros(DIM, np.float32)),
            mode=RefMode.PASSAGE,
            init_size=n,
        )
        for start, c in chunks():
            index.add(
                c, psg_ids=[f"p{j}" for j in range(start, start + c.shape[0])]
            )
        assert len(index) == n
    peak_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(json.dumps({"which": which, "n": n, "peak_rss_mib": peak_kib / 1024}))


def measure_memory(n: int):
    """Config: index-memory parity (north star 'equal index memory').

    Runs each engine in its own subprocess building an N x 768 fp32 index
    from a chunked corpus stream and compares peak RSS.  Ours uses
    ``store="device"`` (rows appended straight to HBM, host stays at
    O(chunk)); the reference keeps the full fp32 corpus in host RAM.
    """
    import subprocess

    out = {}
    for which in ("ours", "ref"):
        code = (
            "import sys; sys.path.insert(0, {root!r}); "
            "from bench import _memory_child; _memory_child({which!r}, {n})"
        ).format(root=str(REPO), which=which, n=n)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        if proc.returncode != 0:
            log(proc.stderr[-2000:])
            raise RuntimeError(f"memory child {which} failed")
        out[which] = json.loads(proc.stdout.strip().splitlines()[-1])
        log(f"{which}: peak RSS {out[which]['peak_rss_mib']:.0f} MiB")
    return out["ours"]["peak_rss_mib"], out["ref"]["peak_rss_mib"]


def measure_ours_early_stopping(corpus, qvecs, run, queries, repeats, cutoff=10):
    """Config #4: early-stopping approximate scoring."""
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.ranking import Ranking

    _enable_compile_cache()
    index = InMemoryIndex(LambdaEncoder(_query_map(qvecs, queries)), mode=Mode.PASSAGE)
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    kwargs = dict(
        early_stopping=cutoff,
        early_stopping_alpha=0.2,
        early_stopping_depths=(200, 1000, 5000),
    )
    t0 = time.perf_counter()
    index(Ranking.from_run(run, queries=queries), **kwargs)
    log(f"ES first call (incl. compile): {time.perf_counter() - t0:.1f}s")
    # cold: a fresh Ranking per repeat (nothing reusable between calls)
    rankings = [Ranking.from_run(run, queries=queries) for _ in range(repeats)]
    t0 = time.perf_counter()
    for r in rankings:
        index(r, **kwargs)
    cold = len(queries) * repeats / (time.perf_counter() - t0)
    log(f"ES cold (fresh ranking per call): {cold:.1f} QPS")
    # warm: repeat the same ranking (round-1 measured this way; the
    # per-ranking ES state then serves candidate resolution and already-
    # scored rows from cache — the alpha-sweep / re-evaluation pattern)
    ranking = Ranking.from_run(run, queries=queries)
    # two untimed warm-up calls: the first scores and fills the ES state,
    # the second builds the plan's categorical result columns (a one-time
    # dictionary build deferred off the cold path)
    for _ in range(2):
        index(ranking, **kwargs)
    t0 = time.perf_counter()
    for _ in range(repeats):
        index(ranking, **kwargs)
    warm = len(queries) * repeats / (time.perf_counter() - t0)
    log(f"ES warm (same ranking repeated): {warm:.1f} QPS")
    return cold, warm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        choices=[
            "rerank", "pipelined", "serve", "server", "encoder", "pq", "int8",
            "early-stopping", "maxp", "alpha-sweep", "memory", "fp32-stream",
            "int8-stream", "pq-stream",
        ],
        # the default (what the driver records) is the full production flow
        # measured against the reference doing the same three steps: semantic
        # scoring + interpolation + top-k cut.  `--config rerank` keeps the
        # rounds-1..3 protocol (fetch all scores, no interpolation).
        default="serve",
    )
    parser.add_argument(
        "--hbm-budget-gb",
        type=float,
        default=10.0,
        help=(
            "scoring-HBM budget for --config fp32-stream / int8-stream / "
            "pq-stream (beyond-HBM hybrid tier)"
        ),
    )
    parser.add_argument("--n", type=int, default=2_000_000)
    parser.add_argument("--n-docs", type=int, default=125_000)
    parser.add_argument("--queries", type=int, default=512)
    parser.add_argument("--depth", type=int, default=1000)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument(
        "--loops", type=int, default=3,
        help="timing loops of --repeats calls each; best loop is reported "
        "(later loops run with fully warm plan/program caches)",
    )
    parser.add_argument(
        "--server-request-queries", type=int, default=8,
        help="queries per concurrent request for --config server",
    )
    parser.add_argument(
        "--server-prep-workers", type=int, default=2,
        help="BatchingServer batch-prep threads for --config server",
    )
    parser.add_argument(
        "--pipeline-depth", type=int, default=4,
        help="in-flight submit/submit_serve futures for the serve and "
        "pipelined configs; in-flight tunnel round trips overlap almost "
        "perfectly, and depth 4-8 converge (bench_logs/serve_depth.log)",
    )
    parser.add_argument(
        "--refine", type=int, default=22,
        help="--config serve: two-phase margin (bf16 fast preselect of "
        "top cutoff+M, exact fp32 rescore on device); 0 disables "
        "(bf16x3 'high' scan, serve_topk only)",
    )
    parser.add_argument("--ref-repeats", type=int, default=2)
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--precision", choices=["exact", "high", "fast"], default="high")
    parser.add_argument(
        "--transport", choices=["f32", "u16"], default="f32",
        help="score transport for rerank/pipelined configs (u16 halves the "
        "per-call device->host score copy)",
    )
    parser.add_argument(
        "--progressive", action="store_true",
        help="split-plane progressive preload: serving starts after the "
        "hi-plane upload (half the table bytes); the exact fp32 tail is "
        "joined (and timed) before the measurement loops",
    )
    args = parser.parse_args()

    ensure_backend()

    if args.config == "encoder":
        ours, ref = bench_encoder(batch=32, length=36, repeats=20)
        print(
            json.dumps(
                {
                    "metric": (
                        "query encoding throughput (BERT-base, 32x36 "
                        "tokens, fused encode+pool on device, pooled "
                        "embeddings fetched with overlapped host copies)"
                    ),
                    "value": round(ours, 1),
                    "unit": "queries/s",
                    "vs_baseline": round(ours / ref, 1),
                }
            )
        )
        return

    if args.config == "memory":
        ours_mib, ref_mib = measure_memory(args.n)
        print(
            json.dumps(
                {
                    "metric": (
                        f"peak host RSS building N={args.n} fp32 index "
                        f"(store=device vs reference in-RAM; smaller is "
                        f"better, vs_baseline = ref/ours)"
                    ),
                    "value": round(ours_mib, 1),
                    "unit": "MiB",
                    "vs_baseline": round(ref_mib / ours_mib, 2),
                }
            )
        )
        return
    if args.config == "maxp":
        num_queries = min(args.queries, 128)
        depth = min(args.depth, 500)
        qps, ref_qps, ndcg, rr = measure_maxp(
            args.n_docs, num_queries, depth, args.repeats,
            max(1, args.ref_repeats // 2), args.skip_baseline,
        )
        print(
            json.dumps(
                {
                    "metric": (
                        f"OnDiskIndex+MAXP re-rank QPS incl. BERT query tower "
                        f"(depth-{depth} docs, {args.n_docs} docs multi-psg, "
                        f"nDCG@10={round(ndcg, 4)}, RR@10={round(rr, 4)})"
                    ),
                    "value": round(qps, 1),
                    "unit": "QPS",
                    "vs_baseline": round(qps / ref_qps, 1) if ref_qps else None,
                }
            )
        )
        return
    if args.config == "alpha-sweep":
        num_queries = min(args.queries, 64)
        corpus, qvecs, run, queries = make_workload(
            args.n, num_queries, max(args.depth, 5000)
        )
        qps, ref_qps, quality = measure_alpha_sweep(
            corpus, qvecs, run, queries, args.repeats,
            max(1, args.ref_repeats // 2), args.skip_baseline,
        )
        mid = quality[0.5]
        print(
            json.dumps(
                {
                    "metric": (
                        f"early-stopping alpha-sweep QPS (5 alphas, depth-5000, "
                        f"N={args.n}, nDCG@10[a=0.5]={round(mid[0], 4)}, "
                        f"RR@10[a=0.5]={round(mid[1], 4)})"
                    ),
                    "value": round(qps, 1),
                    "unit": "QPS",
                    "vs_baseline": round(qps / ref_qps, 1) if ref_qps else None,
                }
            )
        )
        return

    serve = None
    if args.config == "serve":
        serve = (0.2, 10, args.refine) if args.refine else (0.2, 10)
        # the pipeline only reaches steady state once it holds several
        # multiples of its depth in flight; keep each timing loop long
        # enough to amortize the fill/drain ramps
        args.repeats = max(args.repeats, 4 * args.pipeline_depth)
    # the reference baseline is the same for refined and unrefined serving
    # (the reference always computes exact host-side interpolate + cut)
    config_key = hashlib.sha1(
        (
            f"{args.n}-{args.queries}-{args.depth}-{DIM}"
            + (f"-serve{serve[:2]}" if serve else "")
        ).encode()
    ).hexdigest()[:12]

    log(f"workload: N={args.n} Q={args.queries} depth={args.depth} dim={DIM}")
    corpus, qvecs, run, queries = make_workload(args.n, args.queries, args.depth)

    if args.config in ("pq", "pq-stream"):
        budget = (
            int(args.hbm_budget_gb * (1 << 30))
            if args.config == "pq-stream"
            else None
        )
        qps = measure_ours_pq(
            corpus, qvecs, run, queries, args.repeats, args.precision,
            hbm_budget=budget,
        )
        tier = " beyond-HBM hybrid" if budget is not None else ""
        print(
            json.dumps(
                {
                    "metric": (
                        f"PQ (M=96,Ks=256){tier} re-rank QPS "
                        f"(depth-{args.depth}, N={args.n})"
                    ),
                    "value": round(qps, 1),
                    "unit": "QPS",
                    "vs_baseline": None,
                }
            )
        )
        return
    if args.config in ("int8", "int8-stream"):
        budget = (
            int(args.hbm_budget_gb * (1 << 30))
            if args.config == "int8-stream"
            else None
        )
        qps = measure_ours_int8(
            corpus, qvecs, run, queries, args.repeats, args.precision,
            hbm_budget=budget,
        )
        tier = " beyond-HBM hybrid" if budget is not None else ""
        print(
            json.dumps(
                {
                    "metric": (
                        f"int8 scalar-quantized{tier} re-rank QPS "
                        f"(depth-{args.depth}, N={args.n})"
                    ),
                    "value": round(qps, 1),
                    "unit": "QPS",
                    "vs_baseline": None,
                }
            )
        )
        return
    if args.config == "early-stopping":
        cold, warm = measure_ours_early_stopping(
            corpus, qvecs, run, queries, args.repeats
        )
        print(
            json.dumps(
                {
                    "metric": (
                        f"early-stopping re-rank QPS, same ranking repeated "
                        f"(cutoff-10, depths 200/1000/5000, N={args.n}, "
                        f"Q={args.queries}; "
                        f"cold/fresh-ranking: {round(cold, 1)} QPS)"
                    ),
                    "value": round(warm, 1),
                    "unit": "QPS",
                    "vs_baseline": None,
                }
            )
        )
        return

    if args.config == "server":
        qps, seq_qps = measure_server(
            corpus, qvecs, run, queries, args.depth, args.repeats,
            args.precision, args.server_request_queries, loops=args.loops,
            prep_workers=args.server_prep_workers,
        )
        print(
            json.dumps(
                {
                    "metric": (
                        f"BatchingServer aggregate serve QPS under "
                        f"continuous load "
                        f"({args.queries // args.server_request_queries} "
                        f"concurrent requests x "
                        f"{args.server_request_queries} queries, "
                        f"depth-{args.depth}, N={args.n}, parallel batch "
                        f"prep; sequential "
                        f"per-request serve: {round(seq_qps, 1)} QPS)"
                    ),
                    "value": round(qps, 1),
                    "unit": "QPS",
                    "vs_baseline": round(qps / seq_qps, 1) if seq_qps else None,
                }
            )
        )
        return

    hbm_budget = (
        int(args.hbm_budget_gb * (1 << 30))
        if args.config == "fp32-stream"
        else None
    )
    qps = measure_ours(
        corpus, qvecs, run, queries, args.depth, args.repeats,
        precision=args.precision, hbm_budget=hbm_budget, loops=args.loops,
        pipelined=args.config == "pipelined", transport=args.transport,
        serve=serve, pipeline_depth=args.pipeline_depth,
        progressive=args.progressive,
    )

    baseline_file = REPO / "BASELINE_MEASURED.json"
    cache = {}
    if baseline_file.exists():
        cache = json.loads(baseline_file.read_text())
    if args.skip_baseline and config_key not in cache:
        ref_qps = None
    elif config_key in cache:
        ref_qps = cache[config_key]["ref_qps"]
        log(f"reference (cached): {ref_qps:.1f} QPS")
    else:
        ref_qps = measure_reference(
            corpus, qvecs, run, queries, args.ref_repeats, serve=serve
        )
        cache[config_key] = {
            "ref_qps": ref_qps,
            "config": {
                "n": args.n,
                "queries": args.queries,
                "depth": args.depth,
                "dim": DIM,
                "mode": "PASSAGE",
                "serve": serve,
                "hardware": "CPU (reference implementation)",
            },
        }
        baseline_file.write_text(json.dumps(cache, indent=2))

    tier_label = {
        "exact": "fp32-exact scoring",
        "high": "fp32 table, bf16x3 'high' scoring",
        "fast": "bf16 'fast' scoring",
    }[args.precision]
    if serve is not None and len(serve) > 2:
        tier_label = "fp32 table, bf16 fast scan + exact fp32 rescore"
    if hbm_budget is not None:
        tier_label += (
            f", beyond-HBM hybrid tier ({args.hbm_budget_gb:g} GiB budget)"
        )
    if args.config == "pipelined":
        tier_label += f", depth-{args.pipeline_depth} submit pipeline"
    if serve is not None:
        tier_label += (
            f", fused serve (interpolate a={serve[0]} + top-{serve[1]} "
            f"on device, depth-{args.pipeline_depth} pipeline"
            + (
                f", two-phase refine margin {serve[2]}"
                if len(serve) > 2
                else ""
            )
            + ")"
        )
    if args.transport == "u16":
        tier_label += ", u16 score transport"
    metric_head = (
        "end-to-end serve QPS" if serve is not None else "re-rank QPS"
    )
    record = {
        "metric": (
            f"{metric_head} (depth-{args.depth}, {DIM}d, {tier_label}, "
            f"N={args.n}, PASSAGE, incl. host orchestration)"
        ),
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / ref_qps, 1) if ref_qps else None,
    }
    if LOOP_QPS:
        samples = sorted(LOOP_QPS)
        record["spread"] = {
            "min": samples[0],
            "median": samples[len(samples) // 2],
            "max": samples[-1],
            "loops": LOOP_QPS,
        }
    print(json.dumps(record))


def _main_with_failure_record() -> None:
    """Run ``main``; on ANY failure still print one machine-readable JSON
    line (``value: null`` + the error) so a transient outage leaves a
    record instead of a bare traceback (the round-3 failure mode)."""
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - the record must always print
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        import traceback

        traceback.print_exc(file=sys.stderr)
        config = "rerank"
        for i, a in enumerate(sys.argv):
            if a == "--config" and i + 1 < len(sys.argv):
                config = sys.argv[i + 1]
            elif a.startswith("--config="):
                config = a.split("=", 1)[1]
        print(
            json.dumps(
                {
                    "metric": f"re-rank QPS (--config {config})",
                    "value": None,
                    "unit": "QPS",
                    "vs_baseline": None,
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
            )
        )
        sys.exit(1)


if __name__ == "__main__":
    _main_with_failure_record()
