from .merging import (category_onehot, grouped_max, grouped_weighted_avg,
                      merge_objects_to_categories)
