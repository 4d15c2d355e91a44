from onpolicy_tpu.models import actor_critic, act, common, gru, mlp, popart  # noqa: F401
