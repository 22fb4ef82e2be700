#!/usr/bin/env python
"""Supervised CRNN training entry (reference main_simple_CRNN.py equivalent).

Usage: python train_crnn.py [-s N] [-n] [--epochs E] [--synthetic_audio]
"""
from dcase2019_task4_tpu.cli import train_crnn

if __name__ == "__main__":
    train_crnn()
