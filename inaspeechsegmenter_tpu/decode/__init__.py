from .viterbi import (viterbi_path, viterbi_decoding, VITERBI_CONSTRAINT_NONE,
                      VITERBI_CONSTRAINT_FORBIDDEN, VITERBI_CONSTRAINT_MANDATORY)
from .transitions import pred2logemission, log_trans_exp, diag_trans_exp

__all__ = ["viterbi_path", "viterbi_decoding", "pred2logemission",
           "log_trans_exp", "diag_trans_exp", "VITERBI_CONSTRAINT_NONE",
           "VITERBI_CONSTRAINT_FORBIDDEN", "VITERBI_CONSTRAINT_MANDATORY"]
