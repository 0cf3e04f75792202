from splatam_tpu.utils.compcache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
