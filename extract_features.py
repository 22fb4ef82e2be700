#!/usr/bin/env python
"""Optional reference-style feature precompute (.npy cache).

Usage: python extract_features.py [--sets TSV ...] [-s N] [--nolog]
"""
from dcase2019_task4_tpu.cli import precompute

if __name__ == "__main__":
    precompute()
