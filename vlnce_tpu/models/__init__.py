from vlnce_tpu.models import cma_policy, seq2seq_policy, waypoint_policy  # noqa: F401  (registry population)
from vlnce_tpu.models.cma_policy import CMAPolicy  # noqa: F401
from vlnce_tpu.models.seq2seq_policy import Seq2SeqPolicy  # noqa: F401
from vlnce_tpu.models.waypoint_policy import WaypointPolicy  # noqa: F401
