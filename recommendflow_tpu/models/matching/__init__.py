from recommendflow_tpu.models.matching.dssm import Dssm, TwoTower
