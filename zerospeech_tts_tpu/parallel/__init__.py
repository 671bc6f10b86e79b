"""Parallelism — ABSENT in the reference (single-process, single-GPU;
SURVEY.md §2 parallelism row), first-class here.

Strategy (SURVEY.md §5/§7): DP via a ``data`` mesh axis (batch-sharded
train/convert steps; pjit inserts the grad psum), optional TP via a
``model`` axis for the wide dense/embedding kernels. PP/EP/ring-attention
have no referent in this model family (no deep stack, no MoE, no
attention) and are intentionally out of scope; the long-sequence story is
batch-of-utterances sharding + blockwise DSP kernels.
"""

from zerospeech_tts_tpu.parallel.distributed import initialize, is_primary  # noqa: F401
from zerospeech_tts_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    device0_bytes,
    make_mesh,
    param_shardings,
    place_state,
    replicate_state,
    replicated,
    shard_state,
)
