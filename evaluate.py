#!/usr/bin/env python
"""Checkpoint evaluation entry (reference TestModel.py equivalent).

Usage: python evaluate.py -m CKPT [-s N] [-p PRED_TSV] [--synthetic_audio]
"""
from dcase2019_task4_tpu.cli import evaluate

if __name__ == "__main__":
    evaluate()
