"""Vendor the CLIP BPE merges table into the repo asset location.

The CLIP tokenizer's 48,894 learned merges (reference
``model/sdm.py:253`` via ``clip/simple_tokenizer``) are data, not code —
they cannot be regenerated offline.  Run this ONCE on any machine that
has a CLIP copy (an HF cache of any CLIP model, the OpenAI
``bpe_simple_vocab_16e6.txt.gz``, or an explicit merges.txt):

    python tools/vendor_clip_bpe.py [--source PATH] [--force]

It copies the table to ``lsdm_tpu/data/assets/bpe_simple_vocab_16e6
.txt.gz`` with a ``.sha256`` content pin that ``resolve_clip_bpe``
verifies on every subsequent load; after that, ``--text_encoder CLIP``
(and the eval CLIs' ``auto`` default) works with no external flags.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--source", default=None,
                    help="merges file or directory (default: search the "
                         "resolution chain — $LSDM_TPU_CLIP_BPE, any CLIP "
                         "model in the HF cache)")
    ap.add_argument("--dest", default=None,
                    help="override the asset destination (tests)")
    ap.add_argument("--force", action="store_true",
                    help="vendor a non-canonical merge count anyway "
                         "(NOT parity-grade)")
    args = ap.parse_args()

    from lsdm_tpu.models.text import vendor_clip_bpe

    try:
        info = vendor_clip_bpe(args.source, dest=args.dest,
                               force=args.force)
    except (FileNotFoundError, ValueError) as e:
        print(f"vendor_clip_bpe: {e}", file=sys.stderr)
        sys.exit(2)
    print(json.dumps(info, indent=2))
    if not info["parity_grade"]:
        print("WARNING: vendored table is NOT the canonical 48,894-merge "
              "CLIP table; embeddings will not match released "
              "checkpoints.", file=sys.stderr)


if __name__ == "__main__":
    main()
