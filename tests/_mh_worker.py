"""Multi-host test worker: one JAX process of a 2-process CPU job.

Launched by ``tests/test_multihost.py`` (two subprocesses, 4 virtual CPU
devices each -> an 8-device global (data=2, shard=4) mesh).  Builds the
same InMemoryIndex on every process, re-ranks the same ranking through the
public API, and checks scores against numpy ground truth.  Prints
``MH_OK <digest>`` on success; the launcher asserts both processes print
the same digest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]

    from fastforward_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert multihost.is_multiprocess()

    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.parallel import MeshConfig
    from fastforward_tpu.ranking import Ranking

    rng = np.random.default_rng(7)  # same seed on every process
    n, dim = 4096, 128
    corpus = rng.normal(size=(n, dim)).astype(np.float32)
    qvecs = {
        "a": rng.normal(size=dim).astype(np.float32),
        "b": rng.normal(size=dim).astype(np.float32),
    }
    enc = LambdaEncoder(lambda q: qvecs[q])

    digests = []

    # --- dense fp32, PASSAGE + MAXP over the global mesh -----------------
    index = InMemoryIndex(
        enc, mode=Mode.PASSAGE, mesh_config=MeshConfig(data=2, shard=4)
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
    run = {
        "q1": {f"p{i}": float(i) for i in range(0, n, 3)},
        "q2": {f"p{i}": float(i) for i in range(1, n, 5)},
    }
    ranking = Ranking.from_run(run, queries={"q1": "a", "q2": "b"})
    out = index(ranking)
    for q_id, qk in (("q1", "a"), ("q2", "b")):
        got = out[q_id]
        for pid in list(got)[:16]:
            truth = float(corpus[int(pid[1:])] @ qvecs[qk])
            assert abs(truth - got[pid]) < 1e-3, (q_id, pid, truth, got[pid])
    out2 = index(ranking)  # warm plan reuse
    assert out == out2
    digests.append(sum(sorted(out["q1"].values())[:50]))

    # --- MAXP doc mode (K reduction across shards) ------------------------
    doc_index = InMemoryIndex(
        enc, mode=Mode.MAXP, mesh_config=MeshConfig(data=2, shard=4)
    )
    doc_index.add(corpus, doc_ids=[f"d{i // 4}" for i in range(n)])
    doc_run = {"q1": {f"d{i}": float(i) for i in range(0, n // 4, 2)}}
    doc_ranking = Ranking.from_run(doc_run, queries={"q1": "a"})
    doc_out = doc_index(doc_ranking)["q1"]
    for did in list(doc_out)[:16]:
        d = int(did[1:])
        truth = float(max(corpus[4 * d + j] @ qvecs["a"] for j in range(4)))
        assert abs(truth - doc_out[did]) < 1e-3, (did, truth, doc_out[did])
    digests.append(sum(sorted(doc_out.values())[:50]))

    # --- int8 scalar quantizer over the mesh ------------------------------
    from fastforward_tpu.quantizer import ScalarQuantizer

    sq = ScalarQuantizer()
    sq.fit(corpus[:1024])
    q_index = InMemoryIndex(
        enc,
        quantizer=sq,
        mode=Mode.PASSAGE,
        mesh_config=MeshConfig(data=2, shard=4),
        precision="exact",
    )
    q_index.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
    q_out = q_index(ranking)["q1"]
    decoded = sq.decode(sq.encode(corpus))
    for pid in list(q_out)[:8]:
        truth = float(decoded[int(pid[1:])] @ qvecs["a"])
        assert abs(truth - q_out[pid]) < 0.05, (pid, truth, q_out[pid])
    digests.append(sum(sorted(q_out.values())[:50]))

    # --- per-host canonical narrowing on the in-memory path ---------------
    # after the sharded view is built, each process may drop the canonical
    # rows outside its own shard band: host memory falls to ~1/2 of the
    # table in this 2-process job, and device scoring is unaffected
    bytes_before = q_index._store.nbytes
    lo, hi = q_index.narrow_to_shard()
    assert hi - lo <= n // 2, (lo, hi, n)
    assert q_index._store.nbytes <= bytes_before // 2 + 1, (
        q_index._store.nbytes,
        bytes_before,
    )
    fresh = Ranking.from_run(run, queries={"q1": "a", "q2": "b"})
    q_out_narrow = q_index(fresh)["q1"]
    assert q_out_narrow == q_out, "narrowing changed device scoring"
    # host row reads now cover only the local band
    local_pid = f"p{lo}"
    got_vecs, got_ids = q_index._get_vectors([local_pid])
    assert got_ids == [local_pid]
    foreign_row = hi if hi < n else lo - 1
    try:
        q_index._get_vectors([f"p{foreign_row}"])
        raise AssertionError("expected IndexError for out-of-band row")
    except IndexError:
        pass
    try:
        q_index.add(corpus[:1], psg_ids=["extra"])
        raise AssertionError("expected RuntimeError for add after narrow")
    except RuntimeError:
        pass
    digests.append(sum(sorted(q_out_narrow.values())[:50]))

    # --- PQ codes + replicated codebooks over the mesh --------------------
    from fastforward_tpu.quantizer import PQ

    pq = PQ(16, 16)  # dim 128 -> 16 subspaces x 16 centroids
    pq.fit(corpus[:2048])
    pq_index = InMemoryIndex(
        enc,
        quantizer=pq,
        mode=Mode.PASSAGE,
        mesh_config=MeshConfig(data=2, shard=4),
        precision="exact",
    )
    pq_index.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
    pq_out = pq_index(ranking)["q1"]
    pq_decoded = pq.decode(pq.encode(corpus))
    for pid in list(pq_out)[:8]:
        truth = float(pq_decoded[int(pid[1:])] @ qvecs["a"])
        assert abs(truth - pq_out[pid]) < 0.05, (pid, truth, pq_out[pid])
    digests.append(sum(sorted(pq_out.values())[:50]))

    # --- per-host row narrowing: the shard axis crosses processes --------
    # (MeshConfig under multi-process JAX lays shards across hosts, so a
    # lazy reader is asked only for this process's rows)
    from fastforward_tpu.parallel.multihost import put_row_sharded_lazy

    mesh = MeshConfig(data=2, shard=4).build()
    requested: list[tuple[int, int]] = []

    def read_rows(start, stop):
        requested.append((start, stop))
        return corpus[start:stop]

    lazy = put_row_sharded_lazy(mesh, corpus.shape, np.float32, read_rows)
    rows_touched = sum(stop - start for start, stop in set(requested))
    assert rows_touched <= n // 2, (
        f"process {process_id} materialized {rows_touched}/{n} rows; "
        "expected at most half (shard axis must cross processes)"
    )
    import jax.numpy as jnp

    total = float(np.asarray(jnp.sum(lazy).addressable_data(0)))
    assert abs(total - float(corpus.sum())) < abs(float(corpus.sum())) * 1e-5

    # --- OnDiskIndex: dense table served lazily from HDF5 per shard ------
    import tempfile
    from pathlib import Path

    from fastforward_tpu.index import OnDiskIndex

    # same path on both processes is NOT needed — each process has its own
    # copy of the file (as on a real pod with a shared or mirrored FS)
    h5dir = Path(tempfile.mkdtemp())
    disk = OnDiskIndex(h5dir / "mh.h5", enc, mode=Mode.PASSAGE)
    disk.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
    disk = OnDiskIndex.load(
        h5dir / "mh.h5",
        enc,
        mode=Mode.PASSAGE,
        hbm_cache=True,
        mesh_config=MeshConfig(data=2, shard=4),
    )
    view = disk._device_view()
    assert view is not None and view.mesh is not None
    disk_out = disk(ranking)["q1"]
    for pid in list(disk_out)[:16]:
        truth = float(corpus[int(pid[1:])] @ qvecs["a"])
        assert abs(truth - disk_out[pid]) < 1e-3, (pid, truth, disk_out[pid])
    digests.append(sum(sorted(disk_out.values())[:50]))

    # --- OnDiskIndex: QUANTIZED tables narrow per shard too --------------
    # (round-4: the lazy HDF5 reader serves int8/PQ code tables, so a pod
    # serving a quantized corpus no longer holds the full code table in
    # every host's RAM or HBM)
    for tag, quantizer in (("pq", pq), ("int8", sq)):
        qdisk = OnDiskIndex(
            h5dir / f"mh_{tag}.h5",
            enc,
            quantizer=quantizer,
            mode=Mode.PASSAGE,
        )
        qdisk.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
        qdisk = OnDiskIndex.load(
            h5dir / f"mh_{tag}.h5",
            enc,
            mode=Mode.PASSAGE,
            hbm_cache=True,
            precision="exact",
            mesh_config=MeshConfig(data=2, shard=4),
        )
        qview = qdisk._device_view()
        assert qview is not None and qview.mesh is not None, tag
        assert qview.kind == ("pq" if tag == "pq" else "scalar"), qview.kind
        # the code table is laid out lazily per shard: this process can
        # address at most half the rows (shard axis crosses processes)
        assert not qview.table.is_fully_addressable, tag
        local_rows = sum(
            s.data.shape[0] for s in qview.table.addressable_shards
        )
        # data=2 replicates each shard onto 2 devices; rows, not copies
        local_unique = local_rows // 2
        assert local_unique <= qview.table.shape[0] // 2, (
            tag,
            local_unique,
            qview.table.shape[0],
        )
        qdisk_out = qdisk(ranking)["q1"]
        qdecoded = quantizer.decode(quantizer.encode(corpus))
        for pid in list(qdisk_out)[:8]:
            truth = float(qdecoded[int(pid[1:])] @ qvecs["a"])
            assert abs(truth - qdisk_out[pid]) < 0.05, (
                tag, pid, truth, qdisk_out[pid],
            )
        digests.append(sum(sorted(qdisk_out.values())[:50]))

    # --- early stopping composes with the multi-host mesh ----------------
    es_kwargs = dict(
        early_stopping=8,
        early_stopping_alpha=0.4,
        early_stopping_depths=(64, 512, 2048),
    )
    es_out = index(
        Ranking.from_run(run, queries={"q1": "a", "q2": "b"}), **es_kwargs
    )["q1"]
    full = {
        pid: float(corpus[int(pid[1:])] @ qvecs["a"])
        for pid in run["q1"]
    }
    top_true = sorted(full, key=lambda k: 0.4 * run["q1"][k] + 0.6 * full[k])[
        -3:
    ]
    for pid in top_true:
        assert pid in es_out, (pid, "missing from ES result")
        assert abs(es_out[pid] - full[pid]) < 1e-3, (pid,)
    digests.append(sum(sorted(es_out.values())[-20:]))

    # --- fused serve (interpolate + top-k on device) across processes ----
    # the streamed sharded scores must stay on device (global-mesh serve
    # tail) — forbid the host top-k fallback for the duration
    from fastforward_tpu import ops as _ops

    def _no_host_topk(*a, **k):
        raise AssertionError("multi-process serve took the host fallback")

    _orig_host_topk = _ops.serve_topk_host
    _ops.serve_topk_host = _no_host_topk
    alpha, cutoff = 0.3, 5
    served = index.serve(ranking, alpha, cutoff)
    assert len(served["q1"]) == cutoff, len(served["q1"])
    want = {
        pid: alpha * run["q1"][pid]
        + (1 - alpha) * float(corpus[int(pid[1:])] @ qvecs["a"])
        for pid in run["q1"]
    }
    top_want = sorted(want, key=want.get, reverse=True)[:cutoff]
    got_serve = served["q1"]
    assert set(got_serve) == set(top_want), (set(got_serve), set(top_want))
    for pid in top_want:
        assert abs(got_serve[pid] - want[pid]) < 1e-3, (
            pid, want[pid], got_serve[pid],
        )
    # pipelined variant returns the identical result
    fut = index.submit_serve(ranking, alpha, cutoff)
    assert fut.result() == served
    _ops.serve_topk_host = _orig_host_topk
    digests.append(sum(sorted(got_serve.values())))

    print(f"MH_OK {np.round(np.asarray(digests), 4).tolist()}", flush=True)


if __name__ == "__main__":
    main()
