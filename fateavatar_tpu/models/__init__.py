from fateavatar_tpu.models.fateavatar import (  # noqa: F401
    FateAvatarConfig,
    FateAvatarModel,
    FateAvatarParams,
    FateAvatarState,
    fateavatar_forward,
    init_fateavatar,
)
