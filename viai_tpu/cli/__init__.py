"""Entry points (L6): train.py / test.py mirroring the reference CLI."""
