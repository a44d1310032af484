from .evaluation import DispEvaluator, inference_on_dataset, print_csv_format
