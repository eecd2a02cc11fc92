#!/usr/bin/env python
"""Reference-compatible training entry point (SURVEY.md §1 L6).

python train.py --name exp --model audio --dataroot <wavs> [...]
"""
from viai_tpu.cli.train import main

if __name__ == "__main__":
    main()
