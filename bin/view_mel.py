#!/usr/bin/env python3
# CLI wrapper. reference: bin/view_mel.py
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mbexwn_vocoder_tpu.cli.view_mel import cli
if __name__ == "__main__":
    cli()
