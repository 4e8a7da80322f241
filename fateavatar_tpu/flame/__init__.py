from fateavatar_tpu.flame.flame import FlameModel, lbs, flame_forward  # noqa: F401
from fateavatar_tpu.flame.loader import (  # noqa: F401
    load_flame_pickle,
    make_flame,
    synthetic_flame,
    synthetic_flame_data,
)
