"""clipx — TPU-native semantic image search framework.

A from-scratch rebuild of the capabilities of ps-auxw/CLI-P (CLIP + faiss +
LMDB command-line image search) designed TPU-first:

- ``clipx.models``   JAX CLIP (ViT image tower + causal text tower), pure
                     functional pytrees, bf16 on the MXU, weight converters
                     from OpenAI / HuggingFace torch checkpoints.
- ``clipx.ops``      Pallas TPU kernels (fused attention, fused MIPS top-k)
                     plus jit-compiled on-device image preprocessing.
- ``clipx.parallel`` Mesh construction, sharding rules, pjit/shard_map
                     encode + corpus-sharded distributed search.
- ``clipx.text``     CLIP byte-pair-encoding tokenizer (host side).
- ``clipx.data``     Streaming host-decode -> device-encode pipeline.
- ``clipx.store``    Host-native C++ key-value store (LMDB-equivalent
                     layout: one env, named sub-databases, sorted cursors,
                     single-writer transactions) bound via ctypes.
- ``clipx.search``   Flat exact MIPS engine (single-device and sharded).
- ``clipx.cli``      The ``build-index.py`` / ``query-index.py`` contract
                     of the reference (same commands, same sub-DB layout,
                     same ranked output format).

Reference behavior is documented in /root/repo/SURVEY.md; citations in
docstrings use the form ``reference:build-index.py:NN``.
"""

__version__ = "0.1.0"
