#!/usr/bin/env python
"""DESED audio acquisition entry (reference download_data.py equivalent).

Usage: python download_data.py [--sets TSV ...] [--n_jobs N]
"""
from dcase2019_task4_tpu.cli import download

if __name__ == "__main__":
    download()
