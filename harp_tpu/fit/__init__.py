from harp_tpu.fit.params import init_params
from harp_tpu.fit.optimizer import build_optimizers, PlateauState, plateau_update
from harp_tpu.fit.driver import FitData, fit_sequence, make_train_step
from harp_tpu.fit.batch import BatchFitData, fit_sequences_batch
from harp_tpu.fit.evaluate import evaluate_sequence
from harp_tpu.fit.resume import prepare_resume_params
