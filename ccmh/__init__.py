"""ccmh — TPU-native CLIP-based Cross-Modal Hashing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
QinLab-WFU/CLIP-based-Cross-Modal-Hashing research suite (reference:
``main.py``, ``train/``, ``model/`` in that repo): 14 CLIP-based
cross-modal hashing methods (image<->text retrieval via binary codes)
behind a single CLI, with on-device Hamming-ranking evaluation.

Layers (bottom-up):
  ccmh.tokenizer  — byte-level BPE with exact OpenAI-CLIP token-id parity
  ccmh.data       — .mat ingestion, seeded splits, host image pipeline
  ccmh.clip       — functional JAX CLIP (ViT-B/32 + text transformer)
  ccmh.models     — per-method hashing heads
  ccmh.losses     — per-method loss functions (pure jnp)
  ccmh.ops        — packed-bit Hamming / mAP kernels (Pallas + XLA)
  ccmh.train      — BertAdam-optax, jitted train/encode steps, trainers
  ccmh.parallel   — mesh construction and sharding rules (DP / TP / FSDP)
  ccmh.retrieval  — device-resident HashIndex + Retriever (top-k serving)
  ccmh.serve      — zero-dependency HTTP serving daemon
"""

__version__ = "0.1.0"
