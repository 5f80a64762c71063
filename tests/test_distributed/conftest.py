"""Multi-process jax.distributed test harness.

TPU translation of the reference's `@torchrun` decorator
(`/root/reference/tests/test_offload/conftest.py:80-160`): a decorated test,
when run under plain pytest, re-invokes ITSELF under N spawned processes,
each running `jax.distributed.initialize` against a shared local
coordinator on the CPU backend (gloo collectives). Under a spawned child
(detected via CT_TPU_JAXRUN) the body runs after init.

Child-side ordering matters: the CPU platform and gloo collectives must be
configured before the backend is instantiated, and jax.distributed must
initialize before the first device access — both happen at this conftest's
import, which pytest guarantees precedes the test module's.
"""

import os
import socket
import subprocess
import sys
from functools import wraps

import jax

if os.environ.get("CT_TPU_JAXRUN"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from compressed_tensors_tpu.distributed.utils import init_dist

    init_dist()  # from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def jaxrun(world_size: int = 2, devices_per_proc: int = 1):
    """Run the decorated test under `world_size` spawned jax.distributed
    processes (CPU backend, `devices_per_proc` virtual devices each)."""

    def decorator(func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            if os.environ.get("CT_TPU_JAXRUN"):
                return func(*args, **kwargs)

            module = sys.modules[func.__module__]
            port = _free_port()
            procs = []
            for rank in range(world_size):
                env = dict(os.environ)
                env.update(
                    CT_TPU_JAXRUN="1",
                    JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                    JAX_NUM_PROCESSES=str(world_size),
                    JAX_PROCESS_ID=str(rank),
                    XLA_FLAGS="--xla_force_host_platform_device_count="
                    f"{devices_per_proc}",
                    CT_TPU_JAXRUN_TMP=os.environ.get(
                        "PYTEST_JAXRUN_TMP", "/tmp"),
                )
                procs.append(subprocess.Popen(
                    [sys.executable, "-m", "pytest",
                     f"{module.__file__}::{func.__name__}", "-sx", "-q",
                     "--no-header", "-p", "no:cacheprovider"],
                    env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True,
                ))
            outs = []
            for p in procs:
                try:
                    out, _ = p.communicate(timeout=300)
                except subprocess.TimeoutExpired:
                    for q in procs:
                        q.kill()
                    raise
                outs.append(out)
            for rank, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, (
                    f"rank {rank} failed (rc={p.returncode}):\n{out}"
                )

        return wrapper

    return decorator
