from recommendflow_tpu.serving.server import EncodeServer, make_server
from recommendflow_tpu.serving.client import RemoteEncoderClient
