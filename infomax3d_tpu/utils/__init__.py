from infomax3d_tpu.utils.setup import enable_persistent_compilation_cache, seed_all

__all__ = ["enable_persistent_compilation_cache", "seed_all"]
