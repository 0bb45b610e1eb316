"""``make parity`` — arm/run the real-weight parity gate.

Prints exactly which artifacts are still missing for the
golden-embedding contract (clipx vs OpenAI CLIP on real weights,
reference:query-index.py:107-108), and runs the gate the moment they
all exist. See tools/README.md for how to produce each artifact.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clipx.text.tokenizer import ClipTokenizer  # noqa: E402


def main() -> int:
    ckpt = os.environ.get("CLIPX_CHECKPOINT")
    golden = os.environ.get("CLIPX_GOLDEN", "tests/golden/clip_golden.npz")
    missing = []
    if not ClipTokenizer().has_learned_merges:
        missing.append(
            "- BPE merge table: put bpe_simple_vocab_16e6.txt.gz next to "
            "clipx/text/tokenizer.py or set $CLIPX_BPE_PATH (the file "
            "ships with the OpenAI CLIP package)")
    if not (ckpt and os.path.exists(ckpt)):
        missing.append(
            "- converted checkpoint: python tools/convert_checkpoint.py "
            "ViT-B-32.pt vit_b32.npz, then export "
            "CLIPX_CHECKPOINT=vit_b32.npz")
    if not os.path.exists(golden):
        missing.append(
            "- golden fixture: run tools/make_golden.py on a host with "
            "the torch CLIP package -> tests/golden/clip_golden.npz")
    if missing:
        print("parity gate NOT armed; missing artifacts:")
        print("\n".join(missing))
        print("(re-run `make parity` once they exist)")
        return 0
    print("all artifacts present — running the gate")
    os.execvp(sys.executable, [sys.executable, "-m", "pytest",
                               "tests/test_real_weight_parity.py", "-v"])
    return 1  # unreachable


if __name__ == "__main__":
    sys.exit(main())
