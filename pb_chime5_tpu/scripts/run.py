"""Main enhancement CLI (reference: pb_chime5/scripts/run.py).

    python -m pb_chime5_tpu.scripts.run [test_run] [-F STORAGE] \
        with session_id=dev wpe=False bss_iterations=5 ...

* config keys = keywords of ``get_enhancer`` (+ session_id, chime6),
* named config ``multiarray`` (reference run.py:30-33),
* ``test_run`` enhances only the first 2 utterances
  (reference run.py:83-86, core.py:371-374),
* outputs land in ``<storage>/<run_id>/audio/<dataset>/<id>.wav``.

Multi-process: either initialize jax.distributed (the default
length-balanced shard then splits by process), or launch many jobs with
``PB_JOB_ID``/``PB_NUM_JOBS`` env vars (Kaldi-style striding — see
kaldi_run.py).

Multi-chip (one process, several local devices — e.g. a v5e-8 host):
``with mesh=auto`` batches same-bucket utterances over all local chips
through one sharded program per group (``with mesh=4`` uses the first 4;
``mesh_freq=2`` adds frequency parallelism inside each utterance;
``utterances_per_device=2`` stacks extra rows per chip).  Default
``mesh=None`` is the single-device path.
"""

import functools

from pb_chime5_tpu import mapping
from pb_chime5_tpu.models.enhancer import get_enhancer
from pb_chime5_tpu.scripts.experiment import Experiment


def get_session_ids(session_id):
    """Resolve 'dev'/'train'/'eval'/'all'/explicit ids -> session list
    (reference run.py:45-71)."""
    if isinstance(session_id, str):
        session_id = [session_id]
    table = dict(mapping.dataset_to_sessions)
    table['all'] = sorted(mapping.session_ids)
    return sorted({
        sess
        for key in session_id
        for sess in table.get(key, [key])
    })


def make_experiment(get_enhancer_fn=get_enhancer, default_storage='runs'):
    experiment = Experiment('Chime5 Array Enhancement',
                            default_storage_dir=default_storage)
    experiment.add_config_from_signature(get_enhancer_fn)
    experiment.add_config({'session_id': 'dev', 'chime6': False,
                           'mesh': None, 'mesh_freq': 1,
                           'utterances_per_device': 1,
                           'warmup': False})
    experiment.named_config('multiarray', {
        'bf_drop_context': True,
        'multiarray': True,
    })

    def run(exp, test_run=False):
        from pb_chime5_tpu.parallel import is_master
        cfg = dict(exp.config)
        chime6 = cfg.pop('chime6', False)
        session_id = cfg.pop('session_id')
        mesh_cfg = cfg.pop('mesh', None)
        mesh_freq = int(cfg.pop('mesh_freq', 1) or 1)
        utterances_per_device = int(cfg.pop('utterances_per_device', 1))
        warmup = bool(cfg.pop('warmup', False))
        mesh = None
        if mesh_cfg not in (None, False, 'None'):
            import jax
            from pb_chime5_tpu.parallel import make_mesh
            local = jax.local_devices()
            n = len(local) if mesh_cfg in (True, 'auto') else int(mesh_cfg)
            assert n % mesh_freq == 0, (n, mesh_freq)
            mesh = make_mesh(data=n // mesh_freq, freq=mesh_freq,
                             devices=local[:n])
            print(f'Mesh: {n} local devices '
                  f'(data={n // mesh_freq}, freq={mesh_freq})')
        if chime6:
            from pb_chime5_tpu.models.enhancer_chime6 import (
                get_enhancer as get_enhancer_c6)
            enhancer_fn = get_enhancer_c6
        else:
            enhancer_fn = get_enhancer_fn
        import inspect
        accepted = set(inspect.signature(enhancer_fn).parameters)
        enhancer = enhancer_fn(
            **{k: v for k, v in cfg.items() if k in accepted})
        session_ids = get_session_ids(session_id)
        print('Enhancer:', type(enhancer).__name__)
        print('Sessions:', session_ids)
        if warmup:
            # AOT compile every bucket program for the first session's
            # real shapes (with the persistent compile cache this makes
            # the first utterance of a fresh process full speed).  With
            # a mesh, this warms the SHARDED batch programs the mesh
            # loop dispatches (direct + session-cache variants).
            enhancer.warmup(session_ids[0], mesh=mesh,
                            utterances_per_device=utterances_per_device)
        enhancer.enhance_session(
            session_ids,
            exp.run_dir / 'audio',
            dataset_slice=test_run,
            audio_dir_exist_ok=True,
            is_master=is_master(),
            mesh=mesh,
            utterances_per_device=utterances_per_device,
        )
        print('Finished experiment dir:', exp.run_dir)

    experiment._commands['main'] = run
    experiment._commands['test_run'] = functools.partial(
        run, test_run=True)
    return experiment


if __name__ == '__main__':
    make_experiment().run_commandline()
