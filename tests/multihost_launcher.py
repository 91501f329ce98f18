"""Per-process launcher for the multi-host CLI tests (test_multihost_cli.py).

Usage: python multihost_launcher.py <coordinator> <process_id> <num_processes>
       <cli_module> <devices_per_process> [cli args...]

Initializes jax.distributed explicitly (the CPU-mesh stand-in for a TPU-pod
DCN launch), then runs a REAL training CLI in-process (phase 1/2/3 — the
module name is an argument). `maybe_initialize_distributed` in the CLI is a
no-op here (no PE_MULTIHOST / coordinator env vars are set) so the
pre-initialized runtime stands.
"""

import faulthandler
import importlib
import os
import signal
import sys

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, process_id, num_processes, cli_module, devices = sys.argv[1:6]
cli_args = sys.argv[6:]

# Per-process local device count must be pinned BEFORE the backend
# initializes (the 2D-mesh test needs >1 device per process).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

jax.distributed.initialize(
    coordinator_address=coordinator,
    num_processes=int(num_processes),
    process_id=int(process_id),
)

# Establish the Gloo collective context NOW, while both processes are aligned
# from the coordinator barrier (the CLI's maybe_initialize_distributed is a
# no-op here, so its warmup doesn't run). See mesh.warmup_collectives.
from playableenvironments_tpu.parallel.mesh import warmup_collectives  # noqa: E402

warmup_collectives()

main = importlib.import_module(
    f"playableenvironments_tpu.cli.{cli_module}"
).main
sys.argv = [cli_module] + cli_args
main()
print(f"process {process_id} finished OK", flush=True)
