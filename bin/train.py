#!/usr/bin/env python3
# CLI wrapper for the trainer (no upstream counterpart; SURVEY §1).
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mbexwn_vocoder_tpu.cli.train import cli
if __name__ == "__main__":
    cli()
