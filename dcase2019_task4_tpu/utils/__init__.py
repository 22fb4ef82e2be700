from dcase2019_task4_tpu.utils.logger import get_logger
from dcase2019_task4_tpu.utils.meters import AverageMeter, AverageMeterSet, SaveBest, EarlyStopping

__all__ = ["get_logger", "AverageMeter", "AverageMeterSet", "SaveBest", "EarlyStopping"]
