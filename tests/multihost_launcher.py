"""Per-process launcher for the multi-host CLI test (test_multihost_cli.py).

Usage: python multihost_launcher.py <coordinator> <process_id> <num_processes>
       <config_path>

Initializes jax.distributed explicitly (the CPU-mesh stand-in for a TPU-pod
DCN launch), then runs the REAL phase-2 training CLI in-process.
`maybe_initialize_distributed` in the CLI is a no-op here (no PE_MULTIHOST /
coordinator env vars are set) so the pre-initialized runtime stands.
"""

import faulthandler
import os
import signal
import sys

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

coordinator, process_id, num_processes, config_path = sys.argv[1:5]
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

from playableenvironments_tpu.cli.train import main  # noqa: E402

sys.argv = ["train", "--config", config_path]
main()
print(f"process {process_id} finished OK", flush=True)
