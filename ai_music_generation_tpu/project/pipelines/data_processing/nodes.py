"""Data-processing nodes (ref: pipelines/data_processing/nodes.py:1-3)."""


def process_data(data):
    """Identity placeholder node — same as the reference's only Kedro node."""
    return data
