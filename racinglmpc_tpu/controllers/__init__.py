from racinglmpc_tpu.controllers.pid import pid_step, make_pid_controller  # noqa: F401
