"""Host-level utterance scheduling — the MPI pool replacement.

The reference's dynamic master/worker index server (dlp_mpi.split_managed,
reference core.py:381) exists because CPU workers process one utterance at
a time and utterance lengths are heavily skewed.  On TPU each host drives
a chip that batches utterances, so the pull-scheduler is replaced by:

* ``length_balanced_shard`` — deterministic snake assignment of
  length-sorted utterances across processes: near-optimal balance with
  zero coordination (the default for multi-host runs via
  ``jax.distributed``).
* ``strided_shard`` — the reference's Kaldi ``job_id``/``number_of_jobs``
  striding (kaldi_run.py:73-76), for run.pl-style cluster launches.
* ``FileQueueScheduler`` — dynamic pull scheduling through an atomic
  claim-file protocol on a shared filesystem, for restartable/elastic
  runs (any number of workers, crash-safe resume: finished outputs are
  skipped, claims can be re-claimed after a timeout).
"""

import os
import time
from pathlib import Path

__all__ = ['process_info', 'serial_shard', 'strided_shard',
           'length_balanced_shard', 'FileQueueScheduler']


def process_info():
    """(process_index, process_count) from jax.distributed if initialized,
    else env (JOB_ID/NUM_JOBS), else (0, 1)."""
    try:
        import jax
        if jax.process_count() > 1:
            return jax.process_index(), jax.process_count()
    except Exception:
        pass
    if 'PB_JOB_ID' in os.environ:
        # 1-based like Kaldi run.pl
        return (int(os.environ['PB_JOB_ID']) - 1,
                int(os.environ['PB_NUM_JOBS']))
    return 0, 1


def serial_shard(items, *_args, **_kwargs):
    """Identity shard matching the ``shard_fn(examples, length_fn)``
    contract of Enhancer.enhance_session (the length_fn is ignored)."""
    return list(items)


def strided_shard(items, process_index=None, process_count=None):
    """items[process_index::process_count] (reference kaldi_run.py:73-76,
    where job_id is 1-based: slice(job_id - 1, None, number_of_jobs))."""
    if process_index is None:
        process_index, process_count = process_info()
    return list(items)[process_index::process_count]


def length_balanced_shard(items, length_fn, process_index=None,
                          process_count=None):
    """Snake-order assignment of length-sorted items.

    Sort descending by length, deal in boustrophedon order
    (0,1,...,P-1,P-1,...,1,0,0,1,...) so every process receives an
    almost equal total length.  Deterministic across processes.
    """
    if process_index is None:
        process_index, process_count = process_info()
    items = list(items)
    order = sorted(range(len(items)), key=lambda i: -length_fn(items[i]))
    mine = []
    for rank, idx in enumerate(order):
        cycle, pos = divmod(rank, process_count)
        target = pos if cycle % 2 == 0 else process_count - 1 - pos
        if target == process_index:
            mine.append(idx)
    # preserve original ordering within the shard (stable outputs)
    return [items[i] for i in sorted(mine)]


class FileQueueScheduler:
    """Dynamic work distribution through atomic claim files.

    Workers race to ``O_CREAT | O_EXCL`` a claim file per item; the winner
    processes the item and writes a done marker.  Crash recovery: claims
    older than ``stale_seconds`` without a done marker may be re-claimed.
    This reproduces the tail-latency behaviour of the reference's MPI
    pull scheduler without requiring MPI, and is idempotent/restartable
    (like the reference's re-run with ``audio_dir_exist_ok``).
    """

    def __init__(self, queue_dir, *, stale_seconds=3600.0, worker_id=None):
        self.queue_dir = Path(queue_dir)
        self.queue_dir.mkdir(parents=True, exist_ok=True)
        self.stale_seconds = stale_seconds
        self.worker_id = worker_id if worker_id is not None else (
            f'{os.uname().nodename}.{os.getpid()}')

    def _claim_path(self, key):
        return self.queue_dir / f'{key}.claim'

    def _done_path(self, key):
        return self.queue_dir / f'{key}.done'

    def try_claim(self, key) -> bool:
        claim = self._claim_path(key)
        if self._done_path(key).exists():
            return False
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # stale claim?
            try:
                age = time.time() - claim.stat().st_mtime
            except FileNotFoundError:
                return False
            if age < self.stale_seconds or self._done_path(key).exists():
                return False
            try:
                claim.unlink()
            except FileNotFoundError:
                pass
            return self.try_claim(key)
        with os.fdopen(fd, 'w') as f:
            f.write(self.worker_id)
        return True

    def mark_done(self, key):
        self._done_path(key).write_text(self.worker_id)

    @staticmethod
    def default_key(item):
        if isinstance(item, dict) and 'example_id' in item:
            return item['example_id']
        return str(item)

    def __call__(self, items, key_fn=None):
        """Yield the items this worker wins; marks each done after the
        consumer advances the generator.

        NOTE: generator-advance done-marking is only crash-safe when the
        consumer fully processes item N before requesting item N+1.  A
        pipelined consumer (like Enhancer.enhance_session, which prefetches
        and dispatches ahead) must use :meth:`shard` instead, whose done
        markers are written by an explicit ``mark_complete`` call after the
        item's output is durable.
        """
        key_fn = key_fn or self.default_key
        for item in items:
            key = key_fn(item)
            if self.try_claim(key):
                yield item
                self.mark_done(key)

    def shard(self, examples, length_fn=None):
        """Adapter matching the ``shard_fn(examples, length_fn)``
        signature of Enhancer.enhance_session (claims are keyed by
        example id, NOT by length).

        Returns a :class:`_ClaimedShard`: iterating yields the examples
        this worker wins; the consumer signals durable completion via
        ``.mark_complete(example_or_key)``, which writes the done marker.
        Until then the claim stays reclaimable after ``stale_seconds`` —
        so a worker that crashes mid-utterance (even with work prefetched
        or dispatched ahead) never strands an unwritten output.
        """
        return _ClaimedShard(self, examples, self.default_key)


class _ClaimedShard:
    """Iterable of won items with completion-driven done markers (see
    FileQueueScheduler.shard)."""

    def __init__(self, scheduler, items, key_fn):
        self._scheduler = scheduler
        self._items = items
        self._key_fn = key_fn

    def __iter__(self):
        for item in self._items:
            if self._scheduler.try_claim(self._key_fn(item)):
                yield item

    def mark_complete(self, item_or_key):
        key = (item_or_key if isinstance(item_or_key, str)
               else self._key_fn(item_or_key))
        self._scheduler.mark_done(key)
