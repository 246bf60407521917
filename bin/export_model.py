#!/usr/bin/env python3
# CLI wrapper (no reference counterpart: AOT serving-artifact export)
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mbexwn_vocoder_tpu.cli.export_model import cli
if __name__ == "__main__":
    cli()
