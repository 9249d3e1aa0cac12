"""Worker process for the REAL 2-process data-parallel run.

Launched by ``tests/test_multiprocess.py::test_two_process_run_matches_single``
as ``python -m tests._mp_worker <out.json>`` with
``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` and
``XLA_FLAGS=--xla_force_host_platform_device_count=4`` in the environment —
i.e. the exact env contract ``train.py`` documents for multi-host launches
(the reference's Lightning DDP equivalent, README.md:149-156).

Goes through the REAL production path end to end:
``mesh.maybe_initialize_distributed`` (env-driven) -> global 8-device mesh
spanning both processes -> ``ClipLoader(process_index, process_count)``
host-sharded input -> ``shard_batch`` auto-detecting process_count > 1 and
assembling the global batch via ``jax.make_array_from_process_local_data``
-> the jitted sharded train step (gradient all-reduce over gloo CPU
collectives)."""

from __future__ import annotations

import json
import sys


def main(out_path: str) -> None:
    import jax

    # sitecustomize imports jax before this module runs — force the CPU
    # platform through jax.config like tests/conftest.py does (env vars
    # alone can be too late).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from sam2_video_tpu.parallel import mesh as mesh_mod
    from tests import _mp_common as C

    assert mesh_mod.maybe_initialize_distributed({}) is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = mesh_mod.make_mesh(num_data=8, num_model=1)
    loader = C.make_loader(jax.process_index(), jax.process_count())
    batches = []
    it = iter(loader)
    while len(batches) < C.STEPS:
        try:
            batches.append(next(it))
        except StopIteration:
            it = iter(loader)  # next epoch
    # shard_batch auto-detects process_count > 1 -> process-local assembly
    losses = C.run_steps(mesh, batches, process_local=None)

    with open(out_path, "w") as f:
        json.dump({"process_index": jax.process_index(),
                   "losses": losses}, f)


if __name__ == "__main__":
    main(sys.argv[1])
