#!/usr/bin/env python
"""Mean-Teacher training entry (reference main.py equivalent).

Usage: python train_meanteacher.py [-s N] [-n] [--epochs E] [--synthetic_audio]
       [--data_parallel] [--bf16] [--resume CKPT]
"""
from dcase2019_task4_tpu.cli import train_meanteacher

if __name__ == "__main__":
    train_meanteacher()
