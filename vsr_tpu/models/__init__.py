from vsr_tpu.models.sttn import STTNGenerator, STTN_AUTO_PATCHSIZES, STTN_DET_PATCHSIZES

__all__ = ["STTNGenerator", "STTN_AUTO_PATCHSIZES", "STTN_DET_PATCHSIZES"]
