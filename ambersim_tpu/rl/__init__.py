"""RL environment layer + training stacks (PPO, SAC, ES, ARS, APG).

Covers the reference's ambersim/rl (env base, helpers, pendulum task) and the
Brax dependencies it leans on (env registry/wrappers D5, trainers D6,
networks/distributions D7, running statistics D8, checkpoint I/O D9). All
trainers share the (make_policy, params, metrics) / progress_fn contract the
reference exercises at examples/rl/pendulum/ex_swingup.py:55-58.
"""

from ambersim_tpu.rl.base import MjxEnv, State  # noqa: F401
from ambersim_tpu.rl.registry import get_environment, register_environment  # noqa: F401

# pre-register packaged environments (instantiation — and model compilation —
# stays lazy; cf. brax's registry used at reference ex_swingup.py:17-18)


def _register_packaged() -> None:
    from ambersim_tpu.rl.registry import register_environment

    def _pendulum(**kwargs):
        from ambersim_tpu.rl.pendulum import PendulumSwingupEnv

        return PendulumSwingupEnv(**kwargs)

    def _quadruped(**kwargs):
        from ambersim_tpu.rl.quadruped import QuadrupedLocomotionEnv

        return QuadrupedLocomotionEnv(**kwargs)

    def _quadruped_terrain(**kwargs):
        from ambersim_tpu.rl.quadruped.terrain import QuadrupedTerrainEnv

        return QuadrupedTerrainEnv(**kwargs)

    def _humanoid_balance(**kwargs):
        from ambersim_tpu.rl.humanoid import HumanoidBalanceEnv

        return HumanoidBalanceEnv(**kwargs)

    register_environment("pendulum_swingup", _pendulum)
    register_environment("quadruped_locomotion", _quadruped)
    register_environment("quadruped_terrain", _quadruped_terrain)
    register_environment("humanoid_balance", _humanoid_balance)


_register_packaged()
