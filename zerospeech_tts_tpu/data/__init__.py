"""L2 — dataset build + loading (ref preprocess.py / make_datasets.py /
make_single_samples.py / dataloader.py; SURVEY.md §2 rows "Corpus builder",
"Segment sampler / index", "Data loader").

Artifacts match the reference contract: an h5 corpus
``{split}/{speaker}/{utt}/{mel,lin}`` (+ per-speaker normalization stats),
a JSON index of fixed-length training segments, and a host loader yielding
``[B, seg_len, n_feat]`` batches (optionally placed on a mesh with a
batch-axis NamedSharding).
"""

from zerospeech_tts_tpu.data.corpus import (  # noqa: F401
    build_corpus,
    discover_wavs,
    merge_corpus_shards,
    speaker_of,
)
from zerospeech_tts_tpu.data.segments import make_segment_index  # noqa: F401
from zerospeech_tts_tpu.data.loader import SegmentLoader  # noqa: F401
