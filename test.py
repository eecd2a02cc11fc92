#!/usr/bin/env python
"""Reference-compatible inference entry point (SURVEY.md §1 L6).

python test.py --name exp --which_epoch latest [...]
"""
from viai_tpu.cli.test import main

if __name__ == "__main__":
    main()
