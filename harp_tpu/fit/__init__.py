from harp_tpu.fit.params import init_params
from harp_tpu.fit.optimizer import build_optimizers, PlateauState, plateau_update
from harp_tpu.fit.driver import FitData, fit_sequence, make_train_step
