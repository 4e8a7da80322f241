from fateavatar_tpu.ops import quaternion, sh, camera, mesh, sampling, knn  # noqa: F401
