from onpolicy_tpu.ops import distributions, gae, losses, schedules, valuenorm  # noqa: F401
