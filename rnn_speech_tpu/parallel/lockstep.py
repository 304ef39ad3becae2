"""Pod-lockstep dispatch accounting shared by every multi-process
evaluation loop.

On a multi-process pod every dispatch is (or contains) a collective — the
sharded eval step psums metrics, the sharded decode gathers replicated
outputs — so EVERY process must launch the exact same program sequence.
Hosts' data shards can be uneven, which creates two hazards this module's
single primitive removes:

  * An exhausted host must not fall out of the loop: it keeps dispatching
    all-padding batches (whose metrics/truths score nothing) until every
    host is done.
  * The number of dispatches must be agreed BEFORE the first one.  A
    per-batch "anyone still going?" allgather would (a) park a blocking
    host collective between every dispatch, serializing exactly the
    pipelining the bounded in-flight window exists for, and (b) risk
    interleaving two different collectives if one host starts the
    allgather while another is still launching compute programs — a pod
    deadlock.

The agreed count is each host's upper BOUND on batches (file count /
batch size, before unreadable/too-long skips): skips only shrink a host's
real count below its bound, so bound.max() always covers every real batch
everywhere, at the cost of a few all-padding trailer steps.

The reference has no distributed execution at all (SURVEY §2c); this is
the pod-scale contract behind its single-device evaluate_full
(/root/reference/models/AcousticModel.py:723-777).
"""

from __future__ import annotations

import numpy as np


def pod_dispatch_bound(local_bound: int) -> int:
    """Allgather each host's dispatch bound and return the pod maximum.

    MUST be called before the first dispatch of the loop it governs, by
    every process, whenever ``jax.process_count() > 1`` (see module
    docstring for why).  Single-process callers should skip the loop's
    padding machinery entirely rather than call this.
    """
    from jax.experimental import multihost_utils

    return int(
        multihost_utils.process_allgather(np.asarray(local_bound)).max()
    )
