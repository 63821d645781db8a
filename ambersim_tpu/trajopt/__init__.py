from ambersim_tpu.trajopt.base import CostFunction, TrajectoryOptimizer, TrajectoryOptimizerParams  # noqa: F401
from ambersim_tpu.trajopt.cost import StaticGoalQuadraticCost  # noqa: F401
from ambersim_tpu.trajopt.gradient import GradientShootingOptimizer  # noqa: F401
from ambersim_tpu.trajopt.ilqr import ILQR, ILQRParams, state_add, state_diff  # noqa: F401
from ambersim_tpu.trajopt.mpc import run_mpc, run_mpc_batch  # noqa: F401
from ambersim_tpu.trajopt.shooting import (  # noqa: F401
    ShootingParams,
    VanillaPredictiveSampler,
    VanillaPredictiveSamplerParams,
    shoot,
)
