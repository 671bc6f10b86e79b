"""ops — Pallas TPU kernels (SURVEY.md §2 "Native kernels": the reference
has no native code; on TPU the analogue is hand-written Pallas kernels for
the hot DSP ops, fused beyond what XLA does automatically)."""

from zerospeech_tts_tpu.ops.pallas_frontend import fused_frontend_pallas  # noqa: F401
