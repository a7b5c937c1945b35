"""Persistent TPU worker: claims the chip once, executes queued job files.

The axon pool takes minutes to release/reclaim the chip between processes,
so ad-hoc TPU scripts thrash. This worker holds one claim and runs jobs
submitted as python files in /tmp/tpu_jobs/; results go to <job>.out with
an .done/.err marker. Run inside tmux so it survives the driver's shell.

Usage:  python tools/tpu_worker.py           # runs forever
Submit: cp myjob.py /tmp/tpu_jobs/ ; wait for /tmp/tpu_jobs/myjob.py.done
"""

import io
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

sys.path.insert(0, "/root/repo")

JOBS = Path("/tmp/tpu_jobs")
JOBS.mkdir(exist_ok=True)

import jax  # noqa: E402

print(f"[worker] devices: {jax.devices()}", flush=True)
# warm the chip
import jax.numpy as jnp  # noqa: E402

print(f"[worker] warmup: {float(jax.jit(lambda x: x * 2)(jnp.ones(())))}", flush=True)

seen: set[str] = set()
while True:
    for job in sorted(JOBS.glob("*.py")):
        marker_done = Path(str(job) + ".done")
        marker_err = Path(str(job) + ".err")
        if job.name in seen or marker_done.exists() or marker_err.exists():
            continue
        seen.add(job.name)
        out_path = Path(str(job) + ".out")
        print(f"[worker] running {job.name}", flush=True)
        # previous jobs' device arrays can outlive their namespace (jit
        # caches, gc cycles, traceback frames) — sweep HBM clean so every
        # job starts from an empty chip (a later job OOM'd on a (8,256)
        # int32 put after two serving jobs had run). Repo modules cached in
        # sys.modules can hold module-level device buffers (noise/constant
        # caches on long-lived objects); deleting those arrays while the
        # module survives leaves dangling 'Array has been deleted' refs —
        # purge the modules too so a later job rebuilds its caches.
        import gc

        for mod in [m for m in sys.modules
                    if m.startswith("fangyan_tts_tpu")
                    or getattr(sys.modules[m], "__file__", None) == "/root/repo/bench.py"
                    or (getattr(sys.modules[m], "__file__", "") or "").startswith("/root/repo/tools/")]:
            del sys.modules[mod]
        gc.collect()
        for arr in list(jax.live_arrays()):
            try:
                arr.delete()
            except Exception:  # noqa: BLE001 — already-deleted/donated
                pass
        t0 = time.time()
        try:
            code = compile(job.read_text(), str(job), "exec")
            ns = {"__name__": "__tpu_job__", "jax": jax, "jnp": jnp}
            with open(out_path, "w", buffering=1) as live:
                with redirect_stdout(live), redirect_stderr(live):
                    exec(code, ns)  # noqa: S102 - local job runner
            marker_done.write_text(f"{time.time() - t0:.1f}s")
            print(f"[worker] {job.name} done in {time.time() - t0:.1f}s", flush=True)
        except (Exception, SystemExit):  # noqa: BLE001 — sys.exit/argparse must not kill the worker (Ctrl-C still does)
            with open(out_path, "a") as f:
                f.write("\n" + traceback.format_exc())
            marker_err.write_text(f"{time.time() - t0:.1f}s")
            print(f"[worker] {job.name} FAILED", flush=True)
    time.sleep(2)
