"""dabstract_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of KULeuvenADVISE/dabstract.

The reference (read at /root/reference) is a pure-Python lazy-sequence
library; this package re-expresses its data model and every operator as
Spark DataFrame transformations (see SURVEY.md for the full mapping), and
extends it with the relational / streaming / training-data-pipeline
operators a 100 TB deployment needs.

Nothing here is a port: the unit of composition is the DataFrame plan,
Catalyst owns optimization, and Python touches data only through
Arrow-vectorized pandas UDFs.
"""

from dabstract_spark.config import dataset_from_config, load_yaml_config
from dabstract_spark.dataset import Dataset
from dabstract_spark.processing import ProcessingChain
from dabstract_spark.session import get_spark
from dabstract_spark.sources.folder import folder_dataset, get_dir_info

__all__ = [
    "get_spark",
    "Dataset",
    "ProcessingChain",
    "dataset_from_config",
    "load_yaml_config",
    "get_dir_info",
    "folder_dataset",
]
__version__ = "0.4.0"
