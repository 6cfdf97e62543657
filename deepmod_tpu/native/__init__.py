from .lib import (
    native_available,
    build_native,
    event_stats_native,
    normalize_signal_native,
    global_align_ops_native,
    minimizers_native,
)
