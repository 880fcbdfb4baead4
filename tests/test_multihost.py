"""Multi-host serving: a 2-process CPU job over one (data=2, shard=4) mesh.

The reference is single-process only; pod-scale TPU serving runs one JAX
process per host (multi-controller SPMD).  This launches two REAL
subprocesses — each with 4 virtual CPU devices — that join one distributed
runtime (``parallel.multihost.initialize``), build the same sharded
``InMemoryIndex`` (dense, MAXP docs, int8), re-rank through the public
API, and verify scores against numpy ground truth inside each worker
(``tests/_mh_worker.py``).  The launcher asserts both processes succeed
and produce identical score digests.
"""

import os
import socket
import subprocess
import sys
import unittest
from pathlib import Path

_WORKER = Path(__file__).parent / "_mh_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class TestMultiHostServing(unittest.TestCase):
    def _run_job(self, port):
        env = dict(os.environ)
        # the workers pin their own JAX_PLATFORMS/XLA_FLAGS; scrub any
        # conflicting distributed state from the launcher's environment
        for var in ("JAX_PLATFORMS", "XLA_FLAGS"):
            env.pop(var, None)
        procs = [
            subprocess.Popen(
                [sys.executable, str(_WORKER), str(pid), str(port)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
            for pid in (0, 1)
        ]
        outputs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=420)
                outputs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return [(p.returncode, out) for p, out in zip(procs, outputs)]

    def test_two_process_mesh_parity(self):
        # the probed free port can be stolen before the coordinator binds
        # it (TOCTOU) — retry the whole job on a fresh port if the bind
        # itself failed
        for attempt in range(3):
            results = self._run_job(_free_port())
            bind_raced = any(
                rc != 0 and ("Address already in use" in out or "bind" in out.lower())
                for rc, out in results
            )
            if not bind_raced or attempt == 2:
                break
        digests = []
        for pid, (rc, out) in enumerate(results):
            self.assertEqual(0, rc, f"worker {pid} failed:\n{out[-4000:]}")
            ok_lines = [ln for ln in out.splitlines() if ln.startswith("MH_OK")]
            self.assertEqual(1, len(ok_lines), out[-2000:])
            digests.append(ok_lines[0])
        # both controllers must have computed identical results
        self.assertEqual(digests[0], digests[1])


if __name__ == "__main__":
    unittest.main()
