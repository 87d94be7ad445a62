"""Multi-host orchestration helpers.

The reference scales with `mpiexec -np N` over an MPI pool
(reference README.md:108-113).  The TPU-native equivalent is one Python
process per host, joined through ``jax.distributed``; the utterance list
is then split with the deterministic schedulers in
``pb_chime5_tpu.parallel.scheduler`` (no master process, no tensor
communication — outputs go to a shared filesystem, exactly like the
reference).

Typical multi-host launch (same command on every host, e.g. via GKE or
``gcloud compute tpus tpu-vm ssh --worker=all``):

    python -m pb_chime5_tpu.scripts.run with session_id=dev ...

with ``initialize()`` called first (the CLI calls ``maybe_initialize``)
— coordinator address/process ids come from the TPU runtime environment
or the standard env vars (JAX_COORDINATOR_ADDRESS, JAX_PROCESS_ID,
JAX_NUM_PROCESSES).
"""

import os

__all__ = ['maybe_initialize', 'initialize', 'is_master', 'barrier']


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def maybe_initialize():
    """Initialize jax.distributed when a multi-process env is configured;
    a no-op for single-host runs."""
    if 'JAX_COORDINATOR_ADDRESS' in os.environ or \
            'COORDINATOR_ADDRESS' in os.environ:
        initialize(
            coordinator_address=os.environ.get(
                'JAX_COORDINATOR_ADDRESS',
                os.environ.get('COORDINATOR_ADDRESS')),
            num_processes=int(os.environ['JAX_NUM_PROCESSES'])
            if 'JAX_NUM_PROCESSES' in os.environ else None,
            process_id=int(os.environ['JAX_PROCESS_ID'])
            if 'JAX_PROCESS_ID' in os.environ else None,
        )
        return True
    return False


def is_master():
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def barrier(name='pb_chime5_tpu_barrier'):
    """Cross-host barrier (replaces dlp_mpi.barrier, reference
    core.py:369): a tiny psum across all devices."""
    import jax
    import jax.numpy as jnp
    if jax.process_count() == 1:
        return
    x = jnp.ones((jax.local_device_count(),))
    jax.pmap(lambda v: jax.lax.psum(v, 'i'), axis_name='i')(x)
