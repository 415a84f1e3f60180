from recommendflow_tpu.models.ranking.dnn import Dnn, DNN
from recommendflow_tpu.models.ranking.dcn import Dcn, DCN
from recommendflow_tpu.models.ranking.deepfm import DeepFm, DeepFM, XDeepFm, XDeepFM
from recommendflow_tpu.models.ranking.mmoe import Mmoe, MMoE
from recommendflow_tpu.models.ranking.tabtransformer import TabTransformer
from recommendflow_tpu.models.ranking.essm import Essm, ESSM, Esmm
from recommendflow_tpu.models.ranking.esim import Esim
