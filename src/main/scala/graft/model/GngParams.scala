package graft.model

/** G-Stream hyperparameters, reference defaults
  * (batchStream.scala:23 and hardcoded constants promoted to config per
  * SURVEY §7.4.6).
  *
  * @param decayFactor   per-batch exponential weight decay α (T3)
  * @param lambdaAge     edge-age multiplier for the winner's edges (T4)
  * @param maxAge        edge expiry threshold (T6)
  * @param nbNodesToAdd  nodes inserted per growth step (T9)
  * @param minWeight     fading eviction threshold (T8)
  * @param alphaErr      error scale-down at insertion (T9)
  * @param errorDecay    per-batch error decay d (T10)
  * @param voisinage     neighborhood-smoothing flag; 0 = off (reference default)
  * @param temperature   kernel temperature (F8; constant 0.3)
  * @param fadeEvery     fading cadence in batches (kk % 3, batchStreamModel.scala:93)
  * @param fadeMinNodes  fading only once the graph exceeds this size (.. :93)
  * @param growEvery     growth cadence in batches (kk % 5, batchStreamModel.scala:100)
  * @param maxNodes      growth cap (batchStreamModel.scala:100)
  */
final case class GngParams(
    decayFactor: Double = 0.9,
    lambdaAge: Double = 1.2,
    maxAge: Double = 250.0,
    nbNodesToAdd: Int = 3,
    minWeight: Double = 1.0,
    alphaErr: Double = 0.5,
    errorDecay: Double = 0.99,
    voisinage: Int = 0,
    temperature: Double = 0.3,
    fadeEvery: Int = 3,
    fadeMinNodes: Int = 100,
    growEvery: Int = 5,
    maxNodes: Int = 300)
