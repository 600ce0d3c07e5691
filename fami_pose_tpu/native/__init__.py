from .nms import cpu_nms, oks_nms_native, soft_oks_nms_native, is_available
