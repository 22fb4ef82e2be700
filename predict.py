#!/usr/bin/env python
"""Groundtruth-free batched inference (serving surface; no reference twin —
TestModel.py:25-62 always scores against labels).

Usage: python predict.py -m CKPT -i WAV_DIR_OR_TSV -p PRED_TSV
       [--weak_fname TAGS_TSV] [--data_parallel] [--torch_checkpoint]
"""
from dcase2019_task4_tpu.cli import predict

if __name__ == "__main__":
    predict()
