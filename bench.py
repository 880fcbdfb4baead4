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


def _enable_compile_cache():
    """Persist XLA compilations under the repo (remote TPU compiles are
    minutes-slow; the cache survives across bench runs)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log(f"compile cache unavailable: {e}")


def measure_ours(corpus, qvecs, run, queries, depth, repeats, precision="exact"):
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.ranking import Ranking

    import jax

    _enable_compile_cache()
    log(f"backend: {jax.default_backend()} precision: {precision}")
    index = InMemoryIndex(
        LambdaEncoder(_query_map(qvecs, queries)),
        mode=Mode.PASSAGE,
        precision=precision,
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    ranking = Ranking.from_run(run, queries=queries)

    t0 = time.perf_counter()
    result = index(ranking)
    log(f"ours: first call (incl. compile) {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(repeats):
        result = index(ranking)
    elapsed = time.perf_counter() - t0
    qps = len(queries) * repeats / elapsed
    log(f"ours: {repeats} calls in {elapsed:.3f}s -> {qps:.1f} QPS")

    # sanity: scores against host-numpy fp32 ground truth
    tolerance = {"exact": 0.05, "high": 0.05, "fast": 1.0}[precision]
    q0 = result["q0"]
    for pid in list(q0)[:3]:
        expected = float(corpus[int(pid[1:])] @ qvecs[0])
        assert abs(expected - q0[pid]) < tolerance, (pid, expected, q0[pid])

    # rank fidelity: top-10 per query must match the exact fp32 ordering
    # (the north-star metric is nDCG/RR parity, not bitwise scores)
    agree = 0
    checked = 8
    for qi in range(checked):
        got = result[f"q{qi}"]
        cand_rows = np.array([int(p[1:]) for p in run[f"q{qi}"]])
        exact = corpus[cand_rows] @ qvecs[qi]
        top_exact = [f"p{cand_rows[j]}" for j in np.argsort(-exact)[:10]]
        agree += int(list(got)[:10] == top_exact)
    log(f"top-10 rank agreement vs exact fp32: {agree}/{checked} queries")
    return qps


def measure_reference(corpus, qvecs, run, queries, repeats):
    """Run the actual CPU reference implementation on the same workload."""
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
            index(ranking)
        elapsed = time.perf_counter() - t0
        qps = len(queries) * repeats / elapsed
        log(f"reference: {repeats} calls in {elapsed:.3f}s -> {qps:.1f} QPS")
        return qps
    finally:
        sys.path.remove("/root/reference/src")
        importlib_metadata.version = orig_version


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

    # note: on the dev tunnel, block_until_ready returns before execution
    # finishes; fetching output bytes is the only reliable sync
    np.asarray(bert.encode_jit(params, batches[0], mask, config))
    t0 = time.perf_counter()
    outs = [bert.encode_jit(params, b, mask, config) for b in batches]
    for o in outs:
        np.asarray(o[:1, :8])
    ours = batch * repeats / (time.perf_counter() - t0)
    log(f"encoder ours: {ours:.1f} queries/s")
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


def measure_ours_pq(corpus, qvecs, run, queries, repeats):
    """Config #3: PQ-quantized index with in-kernel ADC scoring."""
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
    )
    t0 = time.perf_counter()
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    log(f"encode+add: {time.perf_counter() - t0:.1f}s")
    ranking = Ranking.from_run(run, queries=queries)

    t0 = time.perf_counter()
    index(ranking)
    log(f"PQ first call (incl. compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(repeats):
        index(ranking)
    qps = len(queries) * repeats / (time.perf_counter() - t0)
    log(f"PQ: {qps:.1f} QPS")
    return qps


def measure_ours_int8(corpus, qvecs, run, queries, repeats, precision):
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
    )
    t0 = time.perf_counter()
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    log(f"encode+add: {time.perf_counter() - t0:.1f}s")
    ranking = Ranking.from_run(run, queries=queries)
    t0 = time.perf_counter()
    index(ranking)
    log(f"int8 first call (incl. compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(repeats):
        index(ranking)
    qps = len(queries) * repeats / (time.perf_counter() - t0)
    log(f"int8: {qps:.1f} QPS")
    return qps


def measure_ours_early_stopping(corpus, qvecs, run, queries, repeats, cutoff=10):
    """Config #4: early-stopping approximate scoring."""
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.ranking import Ranking

    _enable_compile_cache()
    index = InMemoryIndex(LambdaEncoder(_query_map(qvecs, queries)), mode=Mode.PASSAGE)
    index.add(corpus, psg_ids=[f"p{i}" for i in range(corpus.shape[0])])
    ranking = Ranking.from_run(run, queries=queries)
    kwargs = dict(
        early_stopping=cutoff,
        early_stopping_alpha=0.2,
        early_stopping_depths=(200, 1000, 5000),
    )
    t0 = time.perf_counter()
    index(ranking, **kwargs)
    log(f"ES first call (incl. compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(repeats):
        index(ranking, **kwargs)
    qps = len(queries) * repeats / (time.perf_counter() - t0)
    log(f"ES: {qps:.1f} QPS")
    return qps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        choices=["rerank", "encoder", "pq", "int8", "early-stopping"],
        default="rerank",
    )
    parser.add_argument("--n", type=int, default=2_000_000)
    parser.add_argument("--queries", type=int, default=512)
    parser.add_argument("--depth", type=int, default=1000)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--ref-repeats", type=int, default=2)
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--precision", choices=["exact", "high", "fast"], default="high")
    args = parser.parse_args()

    if args.config == "encoder":
        ours, ref = bench_encoder(batch=32, length=36, repeats=20)
        print(
            json.dumps(
                {
                    "metric": "query encoding throughput (BERT-base, 32x36 tokens)",
                    "value": round(ours, 1),
                    "unit": "queries/s",
                    "vs_baseline": round(ours / ref, 1),
                }
            )
        )
        return

    config_key = hashlib.sha1(
        f"{args.n}-{args.queries}-{args.depth}-{DIM}".encode()
    ).hexdigest()[:12]

    log(f"workload: N={args.n} Q={args.queries} depth={args.depth} dim={DIM}")
    corpus, qvecs, run, queries = make_workload(args.n, args.queries, args.depth)

    if args.config == "pq":
        qps = measure_ours_pq(corpus, qvecs, run, queries, args.repeats)
        print(
            json.dumps(
                {
                    "metric": (
                        f"PQ (M=96,Ks=256) re-rank QPS "
                        f"(depth-{args.depth}, N={args.n})"
                    ),
                    "value": round(qps, 1),
                    "unit": "QPS",
                    "vs_baseline": None,
                }
            )
        )
        return
    if args.config == "int8":
        qps = measure_ours_int8(
            corpus, qvecs, run, queries, args.repeats, args.precision
        )
        print(
            json.dumps(
                {
                    "metric": (
                        f"int8 scalar-quantized re-rank QPS "
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
        qps = measure_ours_early_stopping(
            corpus, qvecs, run, queries, args.repeats
        )
        print(
            json.dumps(
                {
                    "metric": (
                        f"early-stopping re-rank QPS "
                        f"(cutoff-10, depths 200/1000/5000, N={args.n})"
                    ),
                    "value": round(qps, 1),
                    "unit": "QPS",
                    "vs_baseline": None,
                }
            )
        )
        return

    qps = measure_ours(corpus, qvecs, run, queries, args.depth, args.repeats, precision=args.precision)

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
            corpus, qvecs, run, queries, args.ref_repeats
        )
        cache[config_key] = {
            "ref_qps": ref_qps,
            "config": {
                "n": args.n,
                "queries": args.queries,
                "depth": args.depth,
                "dim": DIM,
                "mode": "PASSAGE",
                "hardware": "CPU (reference implementation)",
            },
        }
        baseline_file.write_text(json.dumps(cache, indent=2))

    tier_label = {
        "exact": "fp32-exact scoring",
        "high": "fp32 table, bf16x3 'high' scoring",
        "fast": "bf16 'fast' scoring",
    }[args.precision]
    print(
        json.dumps(
            {
                "metric": (
                    f"re-rank QPS (depth-{args.depth}, {DIM}d, {tier_label}, "
                    f"N={args.n}, PASSAGE, incl. host orchestration)"
                ),
                "value": round(qps, 1),
                "unit": "QPS",
                "vs_baseline": round(qps / ref_qps, 1) if ref_qps else None,
            }
        )
    )


if __name__ == "__main__":
    main()
