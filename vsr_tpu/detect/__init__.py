from vsr_tpu.detect.boxes import get_coordinates
from vsr_tpu.detect.dbnet import DBNet
from vsr_tpu.detect.postprocess import db_postprocess
from vsr_tpu.detect.detector import SubtitleDetector

__all__ = ["get_coordinates", "DBNet", "db_postprocess", "SubtitleDetector"]
