from .dataset import Dataset, load, list_datasets  # noqa: F401
