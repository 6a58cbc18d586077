from quest_tpu.kv.paged_kv import (LayerKV, PagedKVCache, append_decode,
                                   append_prefill, init_cache)

__all__ = ["LayerKV", "PagedKVCache", "append_decode", "append_prefill",
           "init_cache"]
