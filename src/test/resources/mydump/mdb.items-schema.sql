CREATE TABLE `items` (
  `item_id` int(11) NOT NULL,
  `sku` varchar(32) NOT NULL,
  `qty` int(11) NOT NULL DEFAULT '1',
  `price` decimal(10,4) DEFAULT NULL,
  `tag` varchar(16) DEFAULT NULL,
  PRIMARY KEY (`item_id`)
) ENGINE=InnoDB;
