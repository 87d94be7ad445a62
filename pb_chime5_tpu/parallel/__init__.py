"""Distribution: host-level work sharding + device-level mesh sharding.

The reference parallelizes with an MPI master/worker pool
(dlp_mpi.split_managed, reference core.py:381) and Kaldi job striding
(kaldi_run.py:73-76).  Here:

* host level (across processes / pods): ``pb_chime5_tpu.parallel.scheduler``
  — static length-balanced or strided sharding of the utterance list, plus
  a dynamic file-lock work queue for single-host multi-process runs.
* device level (across chips): ``pb_chime5_tpu.parallel.mesh`` — ``Mesh``
  construction and ``shard_map``-based batched enhancement with data
  parallelism over utterances and frequency parallelism within an
  utterance.
"""

from pb_chime5_tpu.parallel.scheduler import (
    serial_shard,
    strided_shard,
    length_balanced_shard,
    FileQueueScheduler,
    process_info,
)
from pb_chime5_tpu.parallel.mesh import (
    make_mesh,
    batched_gss_enhance,
    sharded_gss_enhance,
)
from pb_chime5_tpu.parallel.batch_driver import (
    BatchDispatcher,
    DispatchedBatch,
)
from pb_chime5_tpu.parallel.distributed import (
    maybe_initialize,
    is_master,
    barrier,
)
