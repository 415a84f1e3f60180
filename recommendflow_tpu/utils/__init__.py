from recommendflow_tpu.utils.str_parser import (
    str2bool, str2debug, str2list, str2dict, str2scale, str2dayno, str2fn, str2loss,
)
from recommendflow_tpu.utils.tables import format_table, print_table
from recommendflow_tpu.utils.logger import get_logger
from recommendflow_tpu.utils.dataprep import (
    filter_illegal_chars, sample_neg_app, get_datetime, get_delta_seconds,
    dump_csv, save_text, split_and_shuffle, df2str, mem_percentage,
)
