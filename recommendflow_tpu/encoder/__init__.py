from recommendflow_tpu.encoder.tokenizer import Tokenizer, build_demo_vocab, load_vocab
from recommendflow_tpu.encoder.text_encoder import TextEncoderService
