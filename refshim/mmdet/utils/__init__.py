import logging


def get_root_logger(log_file=None, log_level=logging.INFO):
    logger = logging.getLogger("mmdet")
    logger.setLevel(log_level)
    return logger
