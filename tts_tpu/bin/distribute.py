"""Multi-process launcher for CPU-based multi-host testing.

On TPU pods the runtime launches one process per host and
``jax.distributed.initialize`` forms the SPMD program — no launcher needed
(the reference's per-GPU Popen fan-out, /root/reference/TTS/bin/distribute.py:13-67,
has no TPU analogue). This tool reproduces that workflow for *local testing*:
it spawns N processes with a shared coordinator so the multi-host code paths
(process_index gating, per-host data sharding) run on one machine.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--script", default="train_tts",
                        help="tts_tpu.bin module to fan out")
    parser.add_argument("--num_processes", type=int, default=2)
    parser.add_argument("--port", type=int, default=12355)
    parser.add_argument("args", nargs=argparse.REMAINDER,
                        help="arguments forwarded to the training script")
    args = parser.parse_args(argv)
    fwd_args = args.args[1:] if args.args[:1] == ["--"] else args.args

    coordinator = f"localhost:{args.port}"
    procs = []
    for rank in range(args.num_processes):
        cmd = [
            sys.executable, "-m", f"tts_tpu.bin.{args.script}",
            *fwd_args,
            "--coordinator_address", coordinator,
            "--num_processes", str(args.num_processes),
            "--process_id", str(rank),
        ]
        env = dict(os.environ)
        env["TTS_TPU_FORCE_CPU"] = "1"  # the TPU plugin ignores JAX_PLATFORMS
        stdout = None if rank == 0 else subprocess.DEVNULL  # rank-0 keeps stdout
        procs.append(subprocess.Popen(cmd, env=env, stdout=stdout))
        time.sleep(0.1)

    rc = 0
    for p in procs:
        rc |= p.wait()
    sys.exit(rc)


if __name__ == "__main__":
    main()
