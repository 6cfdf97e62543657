from .lstm_pallas import lstm_layer_pallas
